package graft.ts

import graft.SparkSpec

class DomFreqSpec extends SparkSpec {
  import spark.implicits._

  test("periodogramTopK: pure sine at an exact bin dominates") {
    val w = 16
    val k0 = 4
    val x = Array.tabulate(w)(t => math.sin(2 * math.Pi * k0 * t / w))
    val top = DomFreq.periodogramTopK(x, fs = 1.0, k = 3)
    assert(math.abs(top(0) - k0.toDouble / w) < 1e-12, s"dom freq ${top(0)} != ${k0.toDouble / w}")
    // dominant bin carries essentially all power: logpow gap is large
    assert(top(3) - top(4) > 3.0)
  }

  test("periodogramTopK: tie-break by bin index is deterministic (constant series)") {
    val top = DomFreq.periodogramTopK(Array.fill(8)(3.0), fs = 1.0, k = 3)
    assert(top(0) == 0.0 && top(1) == 0.125 && top(2) == 0.25)
    assert(top.drop(3).forall(_ == Double.NegativeInfinity))
  }

  test("domfreq over grouped series: full padded windows, sine detected per group") {
    val w = 15
    // period-5 sine → frequency 0.2 = bin 3 of 15
    val rows = for (g <- Seq(1, 2); t <- 0 until 60)
      yield (g, t, math.sin(2 * math.Pi * t / 5.0) + g)
    val df = rows.toDF("g", "t", "v")
    val res = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), Seq("centered"), nDomfreq = 2)
    assert(res.featureNames.size == 4)
    val out = res.df
    assert(out.count() == 120, "one output row per input row (padding dropped)")
    val dom = out.filter($"g" === 1 && $"t" >= 7 && $"t" < 53)
      .select("v_domfreq1_w15c").as[Double].collect()
    assert(dom.forall(f => math.abs(f - 0.2) < 0.07), s"interior windows should peak near 0.2, got ${dom.distinct.mkString(",")}")
  }

  /** Reference goldens (domfreq_ref_*.csv) produced by running the
    * reference's domfreq_one_column_grp with a pure-numpy periodogram
    * equivalent to scipy's (boxcar, one-sided, linear detrend) on
    * v_t = sin(0.7t) + 0.05t. Covers odd windows, EVEN windows
    * (hw = w//2 padding, window [p-hw, p+w-1-hw]), and the ts_domfreq
    * query config (w=21, k=5). Tolerance 1e-8 absorbs rFFT-vs-DFT
    * noise.
    */
  private def goldenCheck(res: String, w: Int, k: Int): Unit = {
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/$res")).getLines().toSeq
    val header = lines.head.split(",")
    val cols = header.drop(2) // t, v, then features
    val data = lines.tail.map(_.split(",").map(_.toDouble))
    val n = data.length
    val df = data.map(r => (1, r(0).toInt, r(1))).toDF("g", "t", "v")
    val out = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), Seq("centered"), nDomfreq = k)
    assert(out.featureNames.toSet == cols.toSet, s"names ${out.featureNames} vs ${cols.toSeq}")
    val got = out.df.orderBy("t").select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
    for (i <- 0 until n; j <- cols.indices) {
      val exp = data(i)(2 + j)
      val g = got(i).getDouble(j)
      assert(math.abs(g - exp) < 1e-8, s"$res row $i col ${cols(j)}: got $g expected $exp")
    }
  }

  test("centered domfreq matches the reference (odd w=9, k=2)") {
    goldenCheck("domfreq_ref_w9k2.csv", 9, 2)
  }

  test("centered domfreq matches the reference (EVEN w=6, k=1)") {
    goldenCheck("domfreq_ref_w6k1.csv", 6, 1)
  }

  test("centered domfreq matches the reference at the query config (w=21, k=5)") {
    goldenCheck("domfreq_ref_w21k5.csv", 21, 5)
  }

  test("groups the reference cannot process yield NULL features (centered n<hw, trailing n<w)") {
    val df = (for (t <- 0 until 3) yield (1, t, math.sin(t * 1.0))).toDF("g", "t", "v")
    val cRes = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(8), Seq("centered"), nDomfreq = 2)
    assert(cRes.df.count() == 3)
    assert(cRes.df.select("v_domfreq1_w8c").na.drop().count() == 0, "centered n<hw -> null")
    val tRes = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(5), Seq("trailing"), nDomfreq = 2)
    assert(tRes.df.select("v_domfreq1_w5t").na.drop().count() == 0, "trailing n<w -> null")
  }

  test("ungrouped series (groupCols = Nil) computes the same windows as a single-group run") {
    val rows = (0 until 80).map(t => (1, t, math.sin(2 * math.Pi * t / 5.0)))
    // repartition(4) scatters the input — the ungrouped path must still
    // see ONE ordered series, not per-partition fragments
    val df = rows.toDF("g", "t", "v").repartition(4)
    val grouped = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(15), Seq("centered"), nDomfreq = 2)
    val ungrouped = DomFreq.domfreq(df, Seq("v"), Nil, Seq("t"), Seq(15), Seq("centered"), nDomfreq = 2)
    val cols = grouped.featureNames
    assert(ungrouped.featureNames == cols)
    val a = grouped.df.orderBy("t").select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
    val b = ungrouped.df.orderBy("t").select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
    assert(a == b)
  }

  test("nDomfreq beyond the window's bin count pads the extra feature columns with nulls") {
    // w=6 → nBins = 4 < nDomfreq = 5: schema still has 2*5 feature
    // columns; bins 5.. are null on every row
    val rows = (0 until 30).map(t => (1, t, math.sin(2 * math.Pi * t / 3.0) + 0.1 * t))
    val df = rows.toDF("g", "t", "v")
    val res = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(6), Seq("centered"), nDomfreq = 5)
    assert(res.featureNames.size == 10)
    val out = res.df.orderBy("t").select(res.featureNames.map(org.apache.spark.sql.functions.col): _*).collect()
    assert(out.length == 30)
    out.foreach { r =>
      // first 4 freq slots populated, 5th null; same for logpow slots
      assert(!r.isNullAt(0) && !r.isNullAt(3), "real bins must be present")
      assert(r.isNullAt(4), "freq slot 5 must be null")
      assert(!r.isNullAt(5) && !r.isNullAt(8), "real logpow bins must be present")
      assert(r.isNullAt(9), "logpow slot 5 must be null")
    }
  }

  test("trailing domfreq emits one row per input and full windows") {
    val rows = for (t <- 0 until 30) yield (1, t, math.cos(t * 0.7))
    val res = DomFreq.domfreq(rows.toDF("g", "t", "v"), Seq("v"), Seq("g"), Seq("t"), Seq(8), Seq("trailing"), nDomfreq = 2)
    assert(res.df.count() == 30)
    assert(res.df.select("v_domfreq1_w8t").na.drop().count() == 30, "padded trailing windows are always full")
  }
}
