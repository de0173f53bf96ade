package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DTW distance between two double arrays — the JIT-compiled twin of
  * [[graft.ts.TimeOps.DtwExprSql]]'s nested-aggregate HOF form.
  *
  * The HOF tree is interpreted (higher-order functions never enter
  * whole-stage codegen as tight loops) and its row-by-row `concat`
  * rebuilds make the DP O(K³) in element copies; this kernel runs the
  * identical recurrence — |vaᵢ − vbⱼ| + least(up, left, diag), same
  * operation order, same null/NaN/least semantics — as ONE static call
  * over two rolling buffers: O(K²) cells, zero allocation churn, codegen
  * and interpreted paths sharing the single [[KernelRuntime.dtw]] body
  * (DtwKernelSpec pins bit-parity against the HOF form, adversarial
  * inputs included). The DuckDB oracle is unchanged: the recurrence is
  * pure abs/min/plus on doubles, bit-exact across ANY evaluation order
  * of the same cells.
  */
case class DtwKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(va: Any, vb: Any): Any =
    KernelRuntime.dtw(va.asInstanceOf[ArrayData], vb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dtw")
      s"""
         |java.lang.Double $tmp = graft.plans.KernelRuntime.dtw($a, $b);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DtwKernel =
    copy(left = l, right = r)
}

object DtwKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def of(va: Column, vb: Column): Column =
    column(DtwKernel(expression(va), expression(vb)))
}
