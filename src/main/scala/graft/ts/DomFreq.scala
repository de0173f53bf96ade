package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import scala.collection.mutable

/** Periodogram dominant-frequency features (reference featurize.py:519
  * domfreq_one_window, :557 domfreq_one_column_grp, :604 domfreq).
  *
  * Reference semantics, replicated (and pinned by leak-probing the
  * reference's rolling windows — see DomFreqSpec):
  *  - the series is PADDED per group before rolling: centered prepends
  *    the first hw = w/2 rows and appends the last hw (featurize.py:
  *    576-581, hw = window_size // 2 — EVEN windows are legal and
  *    window = positions [p-hw, p+w-1-hw]); trailing prepends the
  *    first w rows. Every original row's window is then exactly w
  *    values, recycling the pad rows near the edges.
  *  - groups too short for the reference's slice/join to line up make
  *    it raise (centered n < hw, trailing n < w) → NULL features here.
  *  - per window: scipy-periodogram with linear detrend, one-sided PSD
  *    (DC/Nyquist not doubled), top `nDomfreq` bins by power → freq and
  *    log(power) features named `{c}_domfreq{i}_w{w}{a}` /
  *    `{c}_domfreq{i}_logpow_w{w}{a}`.
  *
  * Spark shape: ONE pass — repartition by group + secondary sort, then
  * a streaming per-partition scan (mapPartitions) holding O(w) state
  * per group: the first min(w,n) values (`head`), a ring of the last w
  * values, and a queue of ≤ w rows awaiting their look-ahead. No
  * padded 3-way union (that planned the scan+window three times), no
  * unbounded collect_list. The DFT kernel reads precomputed trig /
  * detrend tables (DftTables) that ALSO drive the SQL oracle emitter
  * (OracleGen.domfreqSql), so both engines combine identical doubles —
  * only log() differs at ulp level, absorbed by round(…,4) on both
  * sides.
  */
object DomFreq {

  /** Precomputed per-window-length tables shared by the Scala kernel
    * and the DuckDB oracle emitter. Trig via StrictMath for platform
    * determinism; sxx (detrend denominator) is data-independent.
    */
  final case class DftTables(n: Int, fs: Double, detrend: String) extends Serializable {
    val tMean: Double = (n - 1) / 2.0
    val dt: Array[Double] = Array.tabulate(n)(i => i - tMean)
    val sxx: Double = { var s = 0.0; var i = 0; while (i < n) { s += dt(i) * dt(i); i += 1 }; s }
    val nBins: Int = n / 2 + 1
    val cosT: Array[Array[Double]] =
      Array.tabulate(nBins, n)((k, i) => StrictMath.cos(-2.0 * math.Pi * k * i / n))
    val sinT: Array[Array[Double]] =
      Array.tabulate(nBins, n)((k, i) => StrictMath.sin(-2.0 * math.Pi * k * i / n))
    val denom: Double = fs * n
  }

  /** scipy.signal.periodogram(x, fs, detrend), one-sided, returning
    * the top-k (freq, log power) pairs, power-descending with
    * bin-ascending tie-break. Output layout: [f1..fk, logp1..logpk].
    * Returns null for malformed windows (wrong length / NaN).
    */
  def periodogramTopK(x: Array[Double], t: DftTables, k: Int): Array[Double] = {
    val n = t.n
    if (x.length != n) return null
    var xMean = 0.0
    var i = 0
    while (i < n) { val v = x(i); if (v.isNaN) return null; xMean += v; i += 1 }
    xMean /= n
    var slope = 0.0
    if (t.detrend == "linear") {
      var sxy = 0.0
      i = 0
      while (i < n) { sxy += t.dt(i) * (x(i) - xMean); i += 1 }
      if (t.sxx > 0) slope = sxy / t.sxx
    }
    val base = if (t.detrend == "none") 0.0 else xMean
    val y = new Array[Double](n)
    i = 0
    while (i < n) { y(i) = x(i) - (base + slope * t.dt(i)); i += 1 }
    // one-sided periodogram, O(n^2) DFT via precomputed trig (n ≤ 64)
    val psd = new Array[Double](t.nBins)
    var kk = 0
    while (kk < t.nBins) {
      var re = 0.0
      var im = 0.0
      val ct = t.cosT(kk)
      val st = t.sinT(kk)
      i = 0
      while (i < n) {
        re += y(i) * ct(i)
        im += y(i) * st(i)
        i += 1
      }
      var p = (re * re + im * im) / t.denom
      val isDc = kk == 0
      val isNyquist = n % 2 == 0 && kk == n / 2
      if (!isDc && !isNyquist) p *= 2.0
      psd(kk) = p
      kk += 1
    }
    val kEff = math.min(k, t.nBins)
    val order = (0 until t.nBins).sortBy(b => (-psd(b), b)).take(kEff)
    val out = new Array[Double](2 * kEff)
    for ((b, j) <- order.zipWithIndex) {
      out(j) = b * t.fs / n
      out(kEff + j) = math.log(psd(b))
    }
    out
  }

  /** Convenience form building throwaway tables (tests / one-off). */
  def periodogramTopK(x: Array[Double], fs: Double, k: Int, detrend: String = "linear"): Array[Double] =
    periodogramTopK(x, DftTables(x.length, fs, detrend), k)

  def domfreq(
      df: DataFrame,
      columns: Seq[String],
      groupCols: Seq[String],
      orderCols: Seq[String],
      windowSizes: Seq[Int],
      windowAligns: Seq[String],
      nDomfreq: Int = 5,
      fs: Double = 1.0,
      detrend: String = "linear"): FeatureResult = {
    val specs = for (c <- columns; w <- windowSizes; a <- windowAligns) yield (c, w, a)
    specs.foldLeft(FeatureResult(df, Nil)) { case (acc, (c, w, a)) =>
      acc.andThen(d => oneSpec(d, c, groupCols, orderCols, w, a, nDomfreq, fs, detrend))
    }
  }

  def featureNames(c: String, w: Int, align: String, nDomfreq: Int): Seq[String] =
    (1 to nDomfreq).map(i => s"${c}_domfreq${i}_w$w${align.head}") ++
      (1 to nDomfreq).map(i => s"${c}_domfreq${i}_logpow_w$w${align.head}")

  private def oneSpec(
      df: DataFrame,
      c: String,
      groupCols: Seq[String],
      orderCols: Seq[String],
      w: Int,
      align: String,
      nDomfreq: Int,
      fs: Double,
      detrend: String): FeatureResult = {
    require(align == "centered" || align == "trailing", s"bad align $align")
    val names = featureNames(c, w, align, nDomfreq)
    val tables = DftTables(w, fs, detrend)
    val kEff = math.min(nDomfreq, tables.nBins)
    val hw = w / 2
    val centered = align == "centered"

    import org.apache.spark.sql.functions.col
    // empty groupCols would compile to RoundRobinPartitioning (rows of
    // the single ungrouped series scattered across partitions → wrong
    // windows at partition boundaries); an ungrouped series is one
    // sequential scan by construction, so pin it to one partition
    val partitioned =
      if (groupCols.isEmpty) df.coalesce(1)
      else df.repartition(groupCols.map(col): _*)
    val sorted = partitioned
      .sortWithinPartitions((groupCols ++ orderCols).map(col): _*)
    val schema = StructType(sorted.schema.fields ++ names.map(StructField(_, DoubleType, nullable = true)))
    val vIdx = sorted.schema.fieldIndex(c)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    // the schema always carries 2*nDomfreq feature columns; when the
    // window has fewer bins than nDomfreq (kEff < nDomfreq) the missing
    // bins are null, matching the element_at-past-end semantics of the
    // declarative form
    val nullFeats: Seq[Any] = Seq.fill(2 * nDomfreq)(null)
    def padFeats(f: Array[Double]): Seq[Any] =
      if (kEff == nDomfreq) f.toIndexedSeq
      else
        (0 until nDomfreq).map(j => if (j < kEff) (f(j): Any) else null) ++
          (0 until nDomfreq).map(j => if (j < kEff) (f(kEff + j): Any) else null)

    val out = sorted.mapPartitions { iter =>
      // per-group state: first min(w,n) values, ring of last w values,
      // queue of rows awaiting their look-ahead. All O(w).
      var key: Seq[Any] = null
      val head = new mutable.ArrayBuffer[Double](w)
      val ring = new Array[Double](w)
      var p = -1L // last position seen in the current group
      val pending = mutable.Queue.empty[(Row, Long)]
      val emitted = mutable.Queue.empty[Row]

      def x(j: Long): Double = if (j < w && j < head.length) head(j.toInt) else ring((j % w).toInt)

      def emit(row: Row, xs: Array[Double]): Unit = {
        val f = periodogramTopK(xs, tables, nDomfreq)
        val feats: Seq[Any] = if (f == null) nullFeats else padFeats(f)
        emitted.enqueue(Row.fromSeq(row.toSeq ++ feats))
      }

      // window for row q once enough look-ahead exists (not a right
      // edge): centered [q-hw .. q+w-1-hw] with head-pad recycling for
      // q < hw; trailing [q-w+1 .. q] with head-pad recycling for
      // q < w-1. All source indices are within head/ring by the
      // finalization rules.
      def assembleEarly(q: Long): Array[Double] = {
        val xs = new Array[Double](w)
        var o = 0
        if (centered) {
          if (q < hw) {
            var j = q
            while (j < hw) { xs(o) = head(j.toInt); o += 1; j += 1 } // pad: x_q..x_{hw-1}
            j = 0
            while (j <= q + w - 1 - hw) { xs(o) = head(j.toInt); o += 1; j += 1 }
          } else {
            var j = q - hw
            while (j <= q + w - 1 - hw) { xs(o) = x(j); o += 1; j += 1 }
          }
        } else {
          if (q < w - 1) {
            var j = q + 1
            while (j < w) { xs(o) = head(j.toInt); o += 1; j += 1 } // pad: x_{q+1}..x_{w-1}
            j = 0
            while (j <= q) { xs(o) = head(j.toInt); o += 1; j += 1 }
          } else {
            var j = q - w + 1
            while (j <= q) { xs(o) = x(j); o += 1; j += 1 }
          }
        }
        xs
      }

      // window for rows finalized at group end (right edges, short
      // groups), n = group size: head ++ mid ++ tail parts with pad
      // recycling, exactly the reference's padded-concat layout.
      def assembleEnd(q: Long, n: Long): Array[Double] = {
        if (centered) {
          if (n < hw) return null
          val buf = new mutable.ArrayBuffer[Double](w)
          if (q < hw) { var j = q; while (j < hw) { buf += x(j); j += 1 } }
          var j = math.max(q - hw, 0L)
          val mEnd = math.min(q + w - 1 - hw, n - 1)
          while (j <= mEnd) { buf += x(j); j += 1 }
          if (q + w - hw > n) {
            j = n - hw
            val tEnd = q + w - 1 - 2L * hw
            while (j <= tEnd) { buf += x(j); j += 1 }
          }
          buf.toArray
        } else {
          if (n < w) null // reference raises for trailing n < w
          else assembleEarly(q)
        }
      }

      def finalizable(q: Long): Boolean =
        if (centered) p - q >= w - 1 - hw
        else if (q >= w - 1) p >= q
        else p >= w - 1

      def flushGroup(): Unit = {
        val n = p + 1
        while (pending.nonEmpty) {
          val (row, q) = pending.dequeue()
          val xs = assembleEnd(q, n)
          if (xs == null) emitted.enqueue(Row.fromSeq(row.toSeq ++ nullFeats))
          else emit(row, xs)
        }
        head.clear()
        p = -1L
      }

      val withSentinel = iter.map(Option(_)) ++ Iterator(None)
      withSentinel.flatMap { rowOpt =>
        rowOpt match {
          case None => flushGroup()
          case Some(row) =>
            val k = gIdx.map(row.get)
            if (key == null || k != key) { flushGroup(); key = k }
            p += 1
            val v = if (row.isNullAt(vIdx)) Double.NaN else
              row.get(vIdx) match {
                case d: java.lang.Double => d.doubleValue()
                case f: java.lang.Float  => f.toDouble
                case other               => other.toString.toDouble
              }
            if (p < w) head += v
            ring((p % w).toInt) = v
            pending.enqueue((row, p))
            while (pending.nonEmpty && finalizable(pending.head._2)) {
              val (r, q) = pending.dequeue()
              emit(r, assembleEarly(q))
            }
        }
        if (emitted.isEmpty) Iterator.empty
        else { val drained = emitted.toList; emitted.clear(); drained.iterator }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    FeatureResult(out, names)
  }
}
