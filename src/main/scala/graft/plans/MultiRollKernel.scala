package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
case class MultiRollKernel(child: Expression, specs: Array[RollSpecDef], bare: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  private val D = java.lang.Double.valueOf(_: Double)
  @transient private lazy val totalOut: Int = specs.map(_.nOut).sum

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](totalOut)
    var o = 0
    var s = 0
    while (s < specs.length) {
      val sp = specs(s)
      val c = sp.colIdx
      val avail = math.min(sp.depth, n)
      val start = n - avail
      // wrapped frame: elements are arrays of column casts (null slot =
      // null source value, row keeps its position). bare frame: plain
      // doubles from a single column — collect_list has already dropped
      // nulls, i.e. the original RollFoldKernel contract (the builder
      // only uses bare when every spec's depth equals the frame depth,
      // so the compacted array IS the spec's whole window)
      @inline def nul(i: Int): Boolean = if (bare) xs.isNullAt(i) else xs.getArray(i).isNullAt(c)
      @inline def at(i: Int): Double = if (bare) xs.getDouble(i) else xs.getArray(i).getDouble(c)
      sp.mode match {
        case 0 => // rollmean: newest→oldest sum over non-nulls, gate cnt >= minP
          var acc = 0.0; var cnt = 0; var i = n - 1
          while (i >= start) { if (!nul(i)) { acc += at(i); cnt += 1 }; i -= 1 }
          out(o) = if (cnt >= sp.minP) D(acc / cnt) else null
          o += 1
        case 1 => // rollstats: min/max/std over non-nulls
          var s1 = 0.0; var s2 = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
          var cnt = 0; var i = n - 1
          while (i >= start) {
            if (!nul(i)) {
              val v = at(i)
              s1 += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              cnt += 1
            }
            i -= 1
          }
          val std = math.sqrt((s2 - (s1 * s1) / cnt) / (cnt - 1))
          out(o) = if (cnt >= sp.minP) D(mn) else null
          out(o + 1) = if (cnt >= sp.minP) D(mx) else null
          out(o + 2) = if (cnt >= math.max(sp.minP, 2)) D(std) else null
          o += 3
        case 2 => // zscore of the current row against its trailing window
          var s1 = 0.0; var s2 = 0.0; var cnt = 0; var i = n - 1
          while (i >= start) { if (!nul(i)) { val v = at(i); s1 += v; s2 += v * v; cnt += 1 }; i -= 1 }
          out(o) =
            if (cnt >= sp.w && n > 0 && !nul(n - 1)) {
              val x = at(n - 1)
              val mean = s1 / cnt
              val std = math.sqrt((s2 - (s1 * s1) / cnt) / (cnt - 1))
              D((x - mean) / std)
            } else null
          o += 1
        case 3 => // truncated EWMA, weights(i) = beta^i newest-first
          var num = 0.0; var den = 0.0; var i = 0
          val lim = math.min(sp.w, avail)
          while (i < lim) {
            if (!nul(n - 1 - i)) {
              val wi = sp.weights(i)
              num += wi * at(n - 1 - i); den += wi
            }
            i += 1
          }
          out(o) = D(num / den)
          o += 1
        case 4 => // autocorr over trailing pairs, gate nPairs >= w
          var np = 0; var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
          var i = 0
          while (i < sp.w) {
            val xi = n - 1 - i
            val yi = xi - sp.lagK
            if (yi >= start && !nul(xi) && !nul(yi)) {
              val x = at(xi)
              val y = at(yi)
              np += 1; sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
            }
            i += 1
          }
          val nd = np.toDouble
          val r = (nd * sxy - sx * sy) / math.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
          out(o) = if (np >= sp.w) D(r) else null
          o += 1
        case 6 => // rolling cross-correlation col[colIdx] vs col[lagK]
          val c2 = sp.lagK
          @inline def nul2(i: Int): Boolean = xs.getArray(i).isNullAt(c2)
          @inline def at2(i: Int): Double = xs.getArray(i).getDouble(c2)
          var np = 0; var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
          var i = 0
          while (i < sp.w) {
            val xi = n - 1 - i
            if (xi >= start && !nul(xi) && !nul2(xi)) {
              val x = at(xi)
              val y = at2(xi)
              np += 1; sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
            }
            i += 1
          }
          val nd = np.toDouble
          val r = (nd * sxy - sx * sy) / math.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
          out(o) = if (np >= sp.w) D(r) else null
          o += 1
        case _ => // mode 5: skew + kurtosis, weights = momentCoefs(w)
          var s1 = 0.0; var s2 = 0.0; var s3 = 0.0; var s4 = 0.0
          var cnt = 0; var i = n - 1
          while (i >= start) {
            if (!nul(i)) {
              val v = at(i)
              s1 += v; s2 += v * v; s3 += v * v * v; s4 += v * v * v * v
              cnt += 1
            }
            i -= 1
          }
          if (cnt >= sp.w) {
            val mean = s1 / cnt
            val m2 = s2 / cnt - mean * mean
            val m3 = s3 / cnt - 3.0 * mean * (s2 / cnt) + 2.0 * mean * mean * mean
            val m4 = s4 / cnt - 4.0 * mean * (s3 / cnt) + 6.0 * (mean * mean) * (s2 / cnt) -
              3.0 * (mean * mean) * (mean * mean)
            out(o) = D(sp.weights(0) * (m3 / (m2 * math.sqrt(m2))))
            out(o + 1) = D(sp.weights(1) * ((sp.weights(2) * ((m4 / (m2 * m2)) - 3.0)) + 6.0))
          } else { out(o) = null; out(o + 1) = null }
          o += 2
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiRollKernel =
    copy(child = newChild)
}

object MultiRollKernel {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def of(xs: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), specs.toArray))

  /** Single-column fast path: `xs` is a plain collect_list(double)
    * frame (no per-row array wrapper). Caller contract: every spec's
    * depth equals the frame depth.
    */
  def ofBare(xs: Column, specs: Seq[RollSpecDef]): Column =
    column(MultiRollKernel(expression(xs), specs.toArray, bare = true))
}
