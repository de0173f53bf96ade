package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 → int64 mapping (see
  * [[KernelRuntime.sortableDoubleBits]]): the enabler of EXACT
  * distributed selection on UNBOUNDED doubles — once doubles are
  * monotone int64 keys, rank problems become integer-radix problems
  * with bounded (2^16-bucket) per-pass state, closing the "exact
  * quantiles of continuous doubles don't scale" gap the fixed-point
  * histogram route couldn't (Profile.exactDoubleQuantiles).
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.sortableDoubleBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.plans.KernelRuntime.sortableDoubleBits($x)")

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}

object SortableDoubleBits {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def of(c: Column): Column = column(SortableDoubleBits(expression(c)))
}
