package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The precomputed branch/weight tables of one Taylor (column, spec)
  * kernel — everything [[KernelRuntime.taylor]] needs at eval time,
  * hoisted into one serializable object so generated (whole-stage
  * codegen) Java can receive it via `addReferenceObj` and interpreted
  * eval can share the identical body.
  *
  * Branch encoding (condType): 0=Overlap, 1=NullAt(i), 2=RposEq(i),
  * 3=PosEq(i), 4=Interior.
  *
  * Shared-frame mode ([[graft.ts.Taylor.sharedKernelBlock]]): the frame
  * may be DEEPER/WIDER than this spec's own window — `frameLo` is the
  * frame's past depth (its rowsBetween lower bound negated; -1 = the
  * frame IS the spec's own, depth h), and `colIdx >= 0` selects the
  * source column inside array-wrapped elements (-1 = bare doubles).
  * The current row sits at index min(pos, frameLo); the spec's lag
  * table entry (from + j) maps to min(pos, frameLo) + (from + j) - h,
  * which reduces to the dedicated-frame indexing when frameLo = h.
  */
final case class TaylorTable(
    w: Int,
    h: Int, // leading lags of the full window (centered: (w-1)/2, trailing: w-1)
    trailing: Boolean,
    degree: Int,
    condTypes: Array[Int],
    condIs: Array[Int],
    froms: Array[Int],
    ms: Array[Array[Array[Double]]],   // branch -> coefficient -> weights
    nullRows: Array[Array[Boolean]],   // branch -> coefficient -> emit null
    zeroRows: Array[Array[Boolean]],   // branch -> coefficient -> emit 0.0
    frameLo: Int = -1,
    colIdx: Int = -1,
    // bare shared frame (colIdx = -1, frameLo >= 0) whose elements
    // encoded null as NaN before collect_list — rows keep position
    // without the per-row array wrapper; the kernel decodes NaN → null
    nanNull: Boolean = false)

/** All Taylor coefficients for one (column, spec) in ONE pass over the
  * row's window array.
  *
  * The Column-expression form (Taylor.windowedTaylorCoefs's CASE
  * chains over ~w distinct lag/lead window expressions) makes
  * WindowExec run one offset frame processor per distinct lag plus a
  * thousand-node projection per row. This kernel replaces all of it
  * with a single sliding collect_list frame and one compiled loop:
  * branch select on (pos, rpos), then degree+1 left-fold dot products
  * against the SAME TaylorBasis weight tables — value-identical to the
  * expression form and to the generated DuckDB oracle (same fold
  * order; TaylorKernelSpec pins bit-equality).
  *
  * Branch weight columns address the FULL-window lag table; the frame
  * is clipped at group edges, so array index = (from + j) - clipLeft
  * with clipLeft = missing leading lags. Out-of-range indices (only
  * possible when input values are NULL — a bare collect_list drops
  * them and shifts the array) yield NULL coefficients; null-free input
  * is the documented contract (the reference NaN-poisons otherwise).
  * Wrapped shared frames (colIdx >= 0) keep null rows in position, so
  * a null inside a branch's weight range yields a NULL coefficient —
  * the same answer the declarative lag/lead CASE form gives.
  *
  * The per-row body is [[KernelRuntime.taylor]]: `nullSafeEval` and the
  * generated code both call it, so interpreted and whole-stage-codegen
  * paths are bit-identical by construction (CodegenWiringSpec pins that
  * the call really appears in generated code — this kernel is NOT on
  * the interpreted CodegenFallback path).
  */
case class TaylorKernel(
    first: Expression,  // window array (array<double> | array<array<double>>)
    second: Expression, // pos (long, 0-based)
    third: Expression,  // cnt (long, group size)
    table: TaylorTable)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(xsAny: Any, posAny: Any, cntAny: Any): Any =
    KernelRuntime.taylor(
      xsAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      posAny.asInstanceOf[Long], cntAny.asInstanceOf[Long], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("taylorTable", table, classOf[TaylorTable].getName)
    // not defineCodeGen: the kernel returns null for rows outside every
    // branch (fillEdges=false edges), so isNull must track the result
    nullSafeCodeGen(ctx, ev, (xs, pos, cnt) => {
      s"""
         |${ev.value} = graft.plans.KernelRuntime.taylor($xs, $pos, $cnt, $tableRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): TaylorKernel =
    copy(first = f, second = s, third = t)
}

object TaylorKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import graft.ts.TaylorBasis._

  def fromSpec(spec: Spec, xs: Column, pos: Column, cnt: Column): Column =
    column(exprFromSpec(spec, expression(xs), expression(pos), expression(cnt)))

  /** Kernel over a SHARED frame (Taylor.sharedKernelBlock): `frameLo` =
    * the frame's past depth, `colIdx` = the spec's column inside
    * array-wrapped elements.
    */
  def fromSpecShared(spec: Spec, xs: Column, pos: Column, cnt: Column,
      frameLo: Int, colIdx: Int, nanNull: Boolean = false): Column = {
    val base = exprFromSpec(spec, expression(xs), expression(pos), expression(cnt))
    column(base.copy(table = base.table.copy(frameLo = frameLo, colIdx = colIdx, nanNull = nanNull)))
  }

  /** The kernel for `spec` with placeholder children — for callers that
    * evaluate [[TaylorKernel.nullSafeEval]] directly outside a plan
    * (the streaming twin's state function), so stream and batch share
    * ONE branch-table construction and ONE fold body.
    */
  def evaluatorFromSpec(spec: Spec): TaylorKernel = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprFromSpec(spec, Literal(0L), Literal(0L), Literal(0L))
  }

  def exprFromSpec(spec: Spec, xs: Expression, pos: Expression, cnt: Expression): TaylorKernel = {
    val brs = branches(spec)
    val trailing = spec.align == "trailing"
    val h = if (trailing) spec.windowSize - 1 else (spec.windowSize - 1) / 2
    val lags = windowLags(spec.windowSize, spec.align)
    def condType(c: Cond): Int = c match {
      case Overlap   => 0
      case NullAt(_) => 1
      case RposEq(_) => 2
      case PosEq(_)  => 3
      case Interior  => 4
    }
    def condI(c: Cond): Int = c match {
      case NullAt(i) => i
      case RposEq(i) => i
      case PosEq(i)  => i
      case _         => -1
    }
    // `from` = index of the branch's first lag within the full window
    val froms = brs.map { br =>
      if (br.lags.isEmpty) 0 else lags.indexOf(br.lags.head)
    }
    TaylorKernel(
      xs, pos, cnt,
      TaylorTable(
        spec.windowSize, h, trailing, spec.degree,
        brs.map(b => condType(b.cond)).toArray,
        brs.map(b => condI(b.cond)).toArray,
        froms.toArray,
        brs.map(_.m).toArray,
        brs.map(_.nullRows).toArray,
        brs.map(b => (0 to spec.degree).map(d => b.m(d).length > 0 && b.m(d).forall(_ == 0.0)).toArray).toArray))
  }
}
