package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Periodogram dominant-frequency features (reference featurize.py:519
  * domfreq_one_window, :557 domfreq_one_column_grp, :604 domfreq).
  *
  * Reference semantics, replicated:
  *  - the series is PADDED per group before rolling: centered prepends
  *    the first hw=(w-1)/2 rows and appends the last hw; trailing
  *    prepends the first w rows (featurize.py:574-587). With odd w this
  *    makes every original row's window exactly w values — no
  *    truncated-window special cases.
  *  - per window: scipy-periodogram with linear detrend, one-sided PSD
  *    (DC/Nyquist not doubled), top `nDomfreq` bins by power → freq and
  *    log(power) features named `{c}_domfreq{i}_w{w}{a}` /
  *    `{c}_domfreq{i}_logpow_w{w}{a}`.
  *
  * Spark shape: one window pass for (pos,count), a 3-way union building
  * the padded stream with synthetic order keys, one ordered
  * collect_list window, then a per-row O(w²) DFT kernel (w ≤ 64). Two
  * sorts total per spec; the kernel is the only non-codegen step and is
  * embarrassingly parallel. The oracle is rows-only (no SQL DFT);
  * correctness is pinned by an analytic ScalaTest (pure sine → exact
  * bin).
  */
object DomFreq {

  /** scipy.signal.periodogram(x, fs, detrend), one-sided, returning
    * the top-k (freq, log power) pairs, power-descending with
    * bin-ascending tie-break. Output layout: [f1..fk, logp1..logpk].
    * `detrend`: "linear" (LS line removed, scipy default), "constant"
    * (mean removed), or "none".
    */
  def periodogramTopK(x: Array[Double], fs: Double, k: Int, detrend: String = "linear"): Array[Double] = {
    val n = x.length
    val tMean = (n - 1) / 2.0
    var xMean = 0.0
    var i = 0
    while (i < n) { xMean += x(i); i += 1 }
    xMean /= n
    var slope = 0.0
    if (detrend == "linear") {
      var sxy = 0.0
      var sxx = 0.0
      i = 0
      while (i < n) { val dt = i - tMean; sxy += dt * (x(i) - xMean); sxx += dt * dt; i += 1 }
      if (sxx > 0) slope = sxy / sxx
    }
    val base = if (detrend == "none") 0.0 else xMean
    val y = new Array[Double](n)
    i = 0
    while (i < n) { y(i) = x(i) - (base + slope * (i - tMean)); i += 1 }
    // one-sided periodogram, O(n^2) DFT (n ≤ 64 in practice)
    val nBins = n / 2 + 1
    val psd = new Array[Double](nBins)
    var kk = 0
    while (kk < nBins) {
      var re = 0.0
      var im = 0.0
      i = 0
      while (i < n) {
        val ang = -2.0 * math.Pi * kk * i / n
        re += y(i) * math.cos(ang)
        im += y(i) * math.sin(ang)
        i += 1
      }
      var p = (re * re + im * im) / (fs * n)
      val isDc = kk == 0
      val isNyquist = n % 2 == 0 && kk == n / 2
      if (!isDc && !isNyquist) p *= 2.0
      psd(kk) = p
      kk += 1
    }
    val kEff = math.min(k, nBins)
    val order = (0 until nBins).sortBy(b => (-psd(b), b)).take(kEff)
    val out = new Array[Double](2 * kEff)
    for ((b, j) <- order.zipWithIndex) {
      out(j) = b * fs / n
      out(kEff + j) = math.log(psd(b))
    }
    out
  }

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

  private def oneSpec(
      df: DataFrame,
      c: String,
      groupCols: Seq[String],
      orderCols: Seq[String],
      w: Int,
      align: String,
      nDomfreq: Int,
      fs: Double,
      detrend: String = "linear"): FeatureResult = {
    require(align == "centered" || align == "trailing", s"bad align $align")
    require(align != "centered" || w % 2 == 1, "centered domfreq requires odd window (like the reference)")
    val win = Featurize.seriesWindow(groupCols, orderCols)
    val cntWin = if (groupCols.isEmpty) Window.partitionBy() else Window.partitionBy(groupCols.map(col): _*)
    val base = df
      .withColumn("__pos", row_number().over(win).cast("long") - 1)
      .withColumn("__cnt", count(lit(1)).over(cntWin))
    val hw = (w - 1) / 2
    // padded stream: __ext is the reference's concatenated frame index
    val (ext, frameLo, frameHi) = align match {
      case "centered" =>
        val head = base.where(col("__pos") < hw)
          .withColumn("__ext", col("__pos")).withColumn("__orig", lit(false))
        val main = base
          .withColumn("__ext", col("__pos") + hw).withColumn("__orig", lit(true))
        val tail = base.where(col("__pos") >= col("__cnt") - hw)
          .withColumn("__ext", col("__pos") + 2L * hw)
          .withColumn("__orig", lit(false))
        (head.unionByName(main).unionByName(tail), -hw, hw)
      case "trailing" =>
        val head = base.where(col("__pos") < w)
          .withColumn("__ext", col("__pos")).withColumn("__orig", lit(false))
        val main = base
          .withColumn("__ext", col("__pos") + w).withColumn("__orig", lit(true))
        (head.unionByName(main), -(w - 1), 0)
    }
    val extWin = Featurize.seriesWindow(groupCols, Seq("__ext")).rowsBetween(frameLo, frameHi)
    val kernel = udf((xs: Seq[Double]) => periodogramTopK(xs.toArray, fs, nDomfreq, detrend))
    val withFeat = ext
      .withColumn("__win", collect_list(col(c).cast("double")).over(extWin))
      .where(col("__orig"))
      .withColumn("__df", kernel(col("__win")))
    val names =
      (1 to nDomfreq).map(i => s"${c}_domfreq${i}_w$w${align.head}") ++
        (1 to nDomfreq).map(i => s"${c}_domfreq${i}_logpow_w$w${align.head}")
    val out = names.zipWithIndex.foldLeft(withFeat) { case (d, (n, i)) =>
      d.withColumn(n, element_at(col("__df"), i + 1))
    }.drop("__pos", "__cnt", "__ext", "__orig", "__win", "__df")
    FeatureResult(out, names)
  }
}
