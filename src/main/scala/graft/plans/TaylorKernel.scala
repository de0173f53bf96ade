package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

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
  * possible when input values are NULL — collect_list drops them and
  * shifts the array) yield NULL coefficients; null-free input is the
  * documented contract (the reference NaN-poisons otherwise).
  *
  * Branch encoding (condType): 0=Overlap, 1=NullAt(i), 2=RposEq(i),
  * 3=PosEq(i), 4=Interior.
  */
case class TaylorKernel(
    first: Expression,  // window array (array<double> | array<array<double>>)
    second: Expression, // pos (long, 0-based)
    third: Expression,  // cnt (long, group size)
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
    // Shared-frame mode (Taylor.sharedKernelBlock): the frame may be
    // DEEPER/WIDER than this spec's own window — `frameLo` is the
    // frame's past depth (its rowsBetween lower bound negated; -1 = the
    // frame IS the spec's own, depth h), and `colIdx >= 0` selects the
    // source column inside array-wrapped elements (-1 = bare doubles).
    // The current row sits at index min(pos, frameLo); the spec's lag
    // table entry (from + j) maps to min(pos, frameLo) + (from + j) - h,
    // which reduces to the dedicated-frame indexing when frameLo = h.
    frameLo: Int = -1,
    colIdx: Int = -1)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(xsAny: Any, posAny: Any, cntAny: Any): Any = {
    val xs = xsAny.asInstanceOf[ArrayData]
    val pos = posAny.asInstanceOf[Long]
    val cnt = cntAny.asInstanceOf[Long]
    val rpos = cnt - 1L - pos
    var b = 0
    var sel = -1
    while (sel < 0 && b < condTypes.length) {
      val hit = condTypes(b) match {
        case 0 => pos < h && rpos < h
        case 1 => rpos == condIs(b)
        case 2 => rpos == condIs(b)
        case 3 => pos == condIs(b)
        case _ => if (trailing) pos >= w else pos >= h && rpos >= h + 1
      }
      if (hit) sel = b else b += 1
    }
    if (sel < 0) return null
    // index of the current row inside the frame: with a dedicated frame
    // (frameLo < 0) the frame starts max(h - pos, 0) short of full, so
    // current = min(pos, h); a shared frame's past depth is frameLo.
    val fl = if (frameLo < 0) h.toLong else frameLo.toLong
    val curIdx = math.min(pos, fl).toInt
    val n = xs.numElements()
    @inline def nulAt(i: Int): Boolean =
      if (colIdx < 0) xs.isNullAt(i) else xs.getArray(i).isNullAt(colIdx)
    @inline def valAt(i: Int): Double =
      if (colIdx < 0) xs.getDouble(i) else xs.getArray(i).getDouble(colIdx)
    val out = new Array[Any](degree + 1)
    val m = ms(sel)
    val from = froms(sel)
    var d = 0
    while (d <= degree) {
      if (nullRows(sel)(d)) out(d) = null
      else if (zeroRows(sel)(d) || m(d).length == 0) out(d) = java.lang.Double.valueOf(0.0)
      else {
        val row = m(d)
        var s = 0.0
        var ok = true
        var j = 0
        while (ok && j < row.length) {
          val idx = curIdx + (from + j) - h
          if (idx < 0 || idx >= n || nulAt(idx)) ok = false
          else {
            if (j == 0) s = row(0) * valAt(idx)
            else s += row(j) * valAt(idx)
            j += 1
          }
        }
        out(d) = if (ok) java.lang.Double.valueOf(s) else null
      }
      d += 1
    }
    new GenericArrayData(out)
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
    * array-wrapped elements (-1 for a bare single-column frame).
    */
  def fromSpecShared(spec: Spec, xs: Column, pos: Column, cnt: Column,
      frameLo: Int, colIdx: Int): Column =
    column(exprFromSpec(spec, expression(xs), expression(pos), expression(cnt))
      .copy(frameLo = frameLo, colIdx = colIdx))

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
      spec.windowSize, h, trailing, spec.degree,
      brs.map(b => condType(b.cond)).toArray,
      brs.map(b => condI(b.cond)).toArray,
      froms.toArray,
      brs.map(_.m).toArray,
      brs.map(_.nullRows).toArray,
      brs.map(b => (0 to spec.degree).map(d => b.m(d).length > 0 && b.m(d).forall(_ == 0.0)).toArray).toArray)
  }
}
