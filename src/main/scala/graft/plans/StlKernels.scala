package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Fused loess kernels for [[graft.ts.Stl]] — the TaylorKernel lesson
  * applied to the STL trend passes.
  *
  * The declarative form of a 2q+1-tap weighted fit is ~2·(2q+1)
  * distinct lag/lead window expressions: WindowExec runs one offset
  * frame processor per distinct offset and the projection above folds
  * them — measured ~1 s of pure window machinery on a 45k-row spine
  * (q = 7 → 28 offset frames for pass 2). Each kernel replaces its
  * whole tap fan with ONE sliding collect_list frame and one
  * JIT-compiled loop whose arithmetic replicates the Column fold
  * term-for-term (StlSpec pins bit-equal outputs of both paths; the
  * DuckDB oracle is unchanged because the fold order is unchanged).
  *
  * r21: the PRODUCTION window routes moved one step further, to
  * [[FrameAggKernels]] — the same folds computed directly inside a
  * TypedImperativeAggregate over a primitive buffer, skipping the
  * boxed collect_list materialization these scalar kernels consume
  * (measured −17..−35% on ts_stl/stl2/strength/rolltheilsen at
  * sf0.1). These scalar forms REMAIN the specs' independent parity
  * reference (StlSpec / RollTheilSenSpec / CodegenWiringSpec pin
  * aggregate ≡ scalar kernel ≡ declarative fold bit-equal) and the
  * streaming route's per-key body (StreamingFeaturize calls
  * [[KernelRuntime.rollTheilSen]] directly).
  *
  * Null/edge contract: a frame clipped at the series edge (size ≠
  * 2q+1) or containing a null input yields a NULL fit — identical to
  * the lag/lead chain's null propagation (any tap null → sums null).
  */
case class StlConvKernel(child: Expression, coefs: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.stlConv(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], coefs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stlConvCoefs", coefs, "double[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val tmp = ctx.freshName("stlConv")
      s"""
         |java.lang.Double $tmp = graft.plans.KernelRuntime.stlConv($xs, $ref);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StlConvKernel =
    copy(child = newChild)
}

/** Weighted degree-1 loess fit at the frame center over [ρ, v] pair
  * elements — see the file doc and [[KernelRuntime.stlLoessFit]].
  */
case class StlLoessFitKernel(
    child: Expression, // array<array<double>> of [rho, v] per frame row
    w0: Array[Double],
    w1: Array[Double],
    w2: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.stlLoessFit(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w0, w1, w2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r0 = ctx.addReferenceObj("stlW0", w0, "double[]")
    val r1 = ctx.addReferenceObj("stlW1", w1, "double[]")
    val r2 = ctx.addReferenceObj("stlW2", w2, "double[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val tmp = ctx.freshName("stlFit")
      s"""
         |java.lang.Double $tmp = graft.plans.KernelRuntime.stlLoessFit($xs, $r0, $r1, $r2);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StlLoessFitKernel =
    copy(child = newChild)
}

/** Rolling Theil-Sen: the lower-median pairwise slope of one trailing
  * [t, v] window — the outlier-robust rolling trend FEATURE (the
  * windowed sibling of TimeOps.theilSen's whole-series estimator),
  * evaluated per row from a single bounded collect_list frame. The
  * declarative equivalent would be w(w−1)/2 ≈ 91 distinct lag-pair
  * expressions per row; see [[KernelRuntime.rollTheilSen]] for the
  * exactness contract (same slope operands as the oracle's unrolled
  * lag pairs, rank pick over an identical double multiset).
  */
case class RollTheilSenKernel(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    KernelRuntime.rollTheilSen(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val tmp = ctx.freshName("rollSen")
      s"""
         |java.lang.Double $tmp = graft.plans.KernelRuntime.rollTheilSen($xs, $w);
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollTheilSenKernel =
    copy(child = newChild)
}

object StlKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def conv(xs: Column, coefs: Array[Double]): Column =
    column(StlConvKernel(expression(xs), coefs))

  def loessFit(xs: Column, w0: Array[Double], w1: Array[Double], w2: Array[Double]): Column =
    column(StlLoessFitKernel(expression(xs), w0, w1, w2))

  def rollTheilSen(xs: Column, w: Int): Column =
    column(RollTheilSenKernel(expression(xs), w))
}
