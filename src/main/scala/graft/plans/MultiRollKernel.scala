package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One roll-family feature request against the shared multi-column
  * frame: `mode` selects the RollFoldKernel fold (same numbering, plus
  * mode 6 = rolling cross-correlation, which only exists fused — it
  * inherently reads TWO columns), `colIdx` the source column inside
  * each frame element, and `(w, minP, lagK, weights)` carry the
  * per-mode parameters (for mode 6, `lagK` is the SECOND column's
  * index).
  */
final case class RollSpecDef(
    mode: Int,
    colIdx: Int,
    w: Int,
    minP: Int,
    lagK: Int,
    weights: Array[Double]) {
  /** Rows of history this spec needs (= its single-kernel frame depth). */
  def depth: Int = if (mode == 4) w + lagK else w
  def nOut: Int = mode match { case 1 => 3; case 5 => 2; case _ => 1 }
}

/** The multi-column fused twin of [[RollFoldKernel]]: ONE sliding
  * collect_list frame — elements are `array(col1, col2, …)` casts of
  * every source column — feeds ONE kernel pass that computes an entire
  * feature family (any mix of modes, columns, and window sizes) and
  * emits all outputs as a flat array<double>. A pipeline over several
  * value columns thus pays a single window aggregation buffer instead
  * of one per (column, spec).
  *
  * Value parity with the single-column kernels is positional: the
  * shared frame is the WIDEST depth over the specs, and each spec folds
  * over only its own trailing `min(depth_spec, n)` rows (index window
  * `[n - avail, n-1]`), replicating the exact element set — hence fold
  * order and bit pattern — its dedicated frame would hold. The zscore
  * current-row term reads the frame's last element, which the trailing
  * `rowsBetween(-(depth-1), 0)` contract guarantees is the current row.
  *
  * NULL handling: frame elements here are array() wrappers and are
  * never dropped by collect_list (unlike the single-column form, whose
  * bare nulls were), so null VALUES keep their row position and are
  * skipped per-fold: mean/min/max/std/moments count non-null terms
  * exactly like the declarative coalesce(x,0)+count expressions, and
  * autocorr requires both pair ends non-null exactly like the
  * expression form's pair() gate. Positional modes (ewmaTrunc weights,
  * zscore's current row) keep the null-free contract of their
  * single-column kernels.
  */
case class MultiRollKernel(left: Expression, right: Expression, specs: Array[RollSpecDef],
    bare: Boolean = false, nanNull: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  // The single fold body lives in KernelRuntime.multiRoll — interpreted
  // eval and generated code both call it, so there is exactly one copy
  // of the bit-exactness-critical loops. `right` = futureLen, the count
  // of future rows in the frame (0 unless sharing a centered-taylor
  // frame — see KernelRuntime.multiRoll).
  override def nullSafeEval(input: Any, future: Any): Any =
    KernelRuntime.multiRoll(input.asInstanceOf[ArrayData], future.asInstanceOf[Int], specs, bare, nanNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specsRef = ctx.addReferenceObj("rollSpecs", specs, "graft.plans.RollSpecDef[]")
    defineCodeGen(ctx, ev,
      (c, f) => s"graft.plans.KernelRuntime.multiRoll($c, $f, $specsRef, $bare, $nanNull)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MultiRollKernel =
    copy(left = l, right = r)
}

object MultiRollKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import org.apache.spark.sql.catalyst.expressions.Literal

  def of(xs: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), Literal(0), specs.toArray))

  /** Wrapped frame that also holds `future` rows AHEAD of the current
    * row (a frame shared with centered taylor specs): `future` must be
    * min(rpos, frameHi) so every trailing fold still ends at the
    * current row.
    */
  def of(xs: Column, future: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), expression(future), specs.toArray))

  /** Single-column fast path: `xs` is a plain collect_list(double)
    * frame (no per-row array wrapper). Caller contract: every spec's
    * depth equals the frame depth.
    */
  def ofBare(xs: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), Literal(0), specs.toArray, bare = true))

  /** Single-source-column SHARED frame fast path: `xs` is a plain
    * collect_list(double) frame whose elements encoded null as NaN
    * (coalesce(x, NaN)) so every row keeps its position — wrapped-frame
    * positional semantics without the per-row array allocation. The
    * frame may be deeper/wider than any one spec and may hold `future`
    * rows ahead of the current row.
    */
  def ofBareNaN(xs: Column, future: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), expression(future), specs.toArray,
      bare = true, nanNull = true))
}
