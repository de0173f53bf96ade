package graft.plans

import graft.SparkSpec
import graft.ts.{Featurize, Taylor, TimeOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity of the r22 frame-fold KERNEL aggregates (MultiRollAgg /
  * TaylorTrailingAgg) against the declarative Column forms they must
  * reproduce bit-for-bit — on NULL-BEARING adversarial input, because
  * the aggregates' NaN-positional encoding is exactly the lag/lead
  * expression forms' (and the DuckDB oracles') null semantics, where
  * the r21 compacted bare collector reached further back past dropped
  * nulls under a null-free-input contract. Also pins aggregate ≡
  * two-step (spark.graft.frameAgg=false) on null-free data, where the
  * compacted and positional contracts coincide.
  */
class FrameKernelAggSpec extends SparkSpec {
  import spark.implicits._

  private val G = Seq("g")
  private val O = Seq("t")

  /** Null-bearing adversarial series: nulls, huge magnitudes, ±0.0,
    * short groups (shorter than every window), exact-window groups.
    */
  private def nullDf: DataFrame = {
    val rng = new scala.util.Random(7)
    val special = Seq(0.0, -0.0, 1e12, -1e12, 2.5, -3.5)
    (for (g <- 0 until 5; t <- 0 until (if (g == 3) 4 else if (g == 4) 14 else 40))
      yield {
        val pick = rng.nextInt(12)
        val v: java.lang.Double =
          if (pick == 0) null
          else if (pick <= 3) special(rng.nextInt(special.length))
          else rng.nextDouble() * 200 - 100
        (g, t, v)
      }).toDF("g", "t", "v")
  }

  /** Null-free variant (for parity with the compacted two-step). */
  private def cleanDf: DataFrame = {
    val rng = new scala.util.Random(9)
    (for (g <- 0 until 4; t <- 0 until (if (g == 2) 5 else 40))
      yield (g, t, rng.nextDouble() * 200 - 100)).toDF("g", "t", "v")
  }

  private def bitsOf(df: DataFrame, cols: Seq[String]): Seq[Seq[Option[Long]]] =
    df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq.map { r =>
      cols.indices.map(i =>
        if (r.isNullAt(i)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i))))
    }

  private def withAgg[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.frameAgg", on.toString)
    try body finally spark.conf.unset("spark.graft.frameAgg")
  }

  test("rollmean agg ≡ declarative lag-fold form on null-bearing input, BIT-exact") {
    val df = nullDf
    val a = withAgg(true) {
      val r = Featurize.rollmean(df, Seq("v"), G, O, Seq(7), None, useKernel = true)
      bitsOf(r.df, r.featureNames)
    }
    val d = {
      val r = Featurize.rollmean(df, Seq("v"), G, O, Seq(7), None, useKernel = false)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
    // minPeriods < w too
    val a2 = withAgg(true) {
      val r = Featurize.rollmean(df, Seq("v"), G, O, Seq(5), Some(2), useKernel = true)
      bitsOf(r.df, r.featureNames)
    }
    val d2 = {
      val r = Featurize.rollmean(df, Seq("v"), G, O, Seq(5), Some(2), useKernel = false)
      bitsOf(r.df, r.featureNames)
    }
    assert(a2 == d2)
  }

  test("rollstats agg ≡ declarative form on null-bearing input, BIT-exact (zeros canonicalized)") {
    // min/max over a frame holding BOTH zero signs: the kernels (r21's
    // multiRoll and this aggregate, identically) fold newest-first with
    // `>`/`<` and keep the first-seen zero, while native max().over()
    // keeps its own first-seen — the SIGN of a zero min/max is
    // evaluation-order-specific on both engines (the oracle compares
    // min/max numerically; a -0.0 cannot arise from the integer-cents
    // gate data). Compare with zeros canonicalized; everything else is
    // raw-bit.
    val df = nullDf
    def canon(b: Seq[Seq[Option[Long]]]): Seq[Seq[Option[Long]]] =
      b.map(_.map(_.map(l => if (l == java.lang.Double.doubleToRawLongBits(-0.0)) 0L else l)))
    val a = withAgg(true) {
      val r = Featurize.rollStats(df, Seq("v"), G, O, Seq(7), None, useKernel = true)
      bitsOf(r.df, r.featureNames)
    }
    val d = {
      val r = Featurize.rollStats(df, Seq("v"), G, O, Seq(7), None, useKernel = false)
      bitsOf(r.df, r.featureNames)
    }
    assert(canon(a) == canon(d))
  }

  test("zscore agg ≡ declarative form on null-bearing input, BIT-exact") {
    val df = nullDf
    val a = withAgg(true) {
      val r = Featurize.zscore(df, "v", G, O, w = 6, useKernel = true)
      bitsOf(r.df, r.featureNames)
    }
    val d = {
      val r = Featurize.zscore(df, "v", G, O, w = 6, useKernel = false)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
  }

  test("autocorr agg ≡ declarative form on null-bearing input, BIT-exact") {
    val df = nullDf
    val a = withAgg(true) {
      val r = Featurize.autocorr(df, "v", G, O, lagK = 2, w = 5, useKernel = true)
      bitsOf(r.df, r.featureNames)
    }
    val d = {
      val r = Featurize.autocorr(df, "v", G, O, lagK = 2, w = 5, useKernel = false)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
  }

  test("ewma_trunc agg ≡ declarative form on null-bearing input, BIT-exact") {
    val df = nullDf
    val a = withAgg(true) {
      bitsOf(TimeOps.ewmaTruncated(df, "v", G, O, alpha = 0.2, k = 8, out = "e",
        useKernel = true), Seq("e"))
    }
    val d = bitsOf(TimeOps.ewmaTruncated(df, "v", G, O, alpha = 0.2, k = 8, out = "e",
      useKernel = false), Seq("e"))
    assert(a == d)
  }

  test("moments agg ≡ collector+kernel two-step on null-free input, BIT-exact") {
    // rollMoments has no declarative twin; on null-free data the
    // compacted and positional contracts coincide
    val df = cleanDf
    val a = withAgg(true) {
      val r = Featurize.rollMoments(df, "v", G, O, w = 6)
      bitsOf(r.df, r.featureNames)
    }
    val d = withAgg(false) {
      val r = Featurize.rollMoments(df, "v", G, O, w = 6)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
  }

  test("crosscorr agg ≡ wrapped-frame kernel (positional) on null-bearing input, BIT-exact") {
    val rng = new scala.util.Random(21)
    val df = (for (g <- 0 until 3; t <- 0 until 30) yield {
      def v(): java.lang.Double =
        if (rng.nextInt(10) == 0) null else rng.nextDouble() * 50 - 25
      (g, t, v(), v())
    }).toDF("g", "t", "x", "y")
    val a = withAgg(true) {
      val r = Featurize.crossCorr(df, "x", "y", G, O, w = 5)
      bitsOf(r.df, r.featureNames)
    }
    val d = withAgg(false) {
      val r = Featurize.crossCorr(df, "x", "y", G, O, w = 5)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
  }

  test("trailing taylor agg ≡ declarative CASE form on null-bearing input, BIT-exact") {
    val df = nullDf
    for ((deg, w, span, fill) <- Seq((2, 7, None, false), (1, 5, None, true),
        (1, 7, Some(5), true))) {
      val a = withAgg(true) {
        val r = Taylor.windowedTaylorCoefs(df, Seq("v"), G, O, deg, Seq(w),
          Seq("trailing"), Seq(span), fill, useKernel = true)
        bitsOf(r.df, r.featureNames)
      }
      val d = {
        val r = Taylor.windowedTaylorCoefs(df, Seq("v"), G, O, deg, Seq(w),
          Seq("trailing"), Seq(span), fill, useKernel = false)
        bitsOf(r.df, r.featureNames)
      }
      assert(a == d, s"deg=$deg w=$w span=$span fill=$fill")
    }
  }

  test("fused block (lags + rollmean + trailing taylor + lead) agg ≡ two-step, and ≡ on nulls") {
    // the ts_pipeline shape end-to-end through featurizeData
    val feats = Seq(
      Featurize.Lag(Seq("v"), Seq(1, 3)),
      Featurize.Rollmean(Seq("v"), Seq(4)),
      Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(5),
        Seq("trailing"), Seq(None), fillEdges = false),
      Featurize.HorizonTargets(Seq("v"), Seq(2), "wide"))
    for (df <- Seq(cleanDf, nullDf)) {
      val a = withAgg(true) {
        val r = Featurize.featurizeData(df, G, O, feats)
        bitsOf(r.df, r.featureNames)
      }
      val d = withAgg(false) {
        val r = Featurize.featurizeData(df, G, O, feats)
        bitsOf(r.df, r.featureNames)
      }
      assert(a == d)
    }
  }

  test("fused block with CENTERED taylor: rolls split to aggregates, taylor unchanged") {
    // the ts_pipeline_full block shape (centered taylor keeps the
    // shared-frame two-step; the rolls move to their own aggregates)
    val feats = Seq(
      Featurize.Lag(Seq("v"), Seq(1)),
      Featurize.Rollmean(Seq("v"), Seq(4)),
      Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(5),
        Seq("centered"), Seq(None), fillEdges = true))
    for (df <- Seq(cleanDf, nullDf)) {
      val a = withAgg(true) {
        val r = Featurize.featurizeData(df, G, O, feats)
        bitsOf(r.df, r.featureNames)
      }
      val d = withAgg(false) {
        val r = Featurize.featurizeData(df, G, O, feats)
        bitsOf(r.df, r.featureNames)
      }
      assert(a == d)
    }
  }

  test("hampel med/mad agg ≡ sorted-collector two-step on null-bearing input, BIT-exact") {
    val df = nullDf
    val a = withAgg(true) {
      bitsOf(TimeOps.hampel(df, "v", G, O, k = 3).withColumn("o",
        col("is_outlier").cast("double")), Seq("value_hampel", "o"))
    }
    val d = withAgg(false) {
      bitsOf(TimeOps.hampel(df, "v", G, O, k = 3).withColumn("o",
        col("is_outlier").cast("double")), Seq("value_hampel", "o"))
    }
    assert(a == d)
  }

  test("rollQuantiles sorted-picks agg ≡ sorted-collector two-step on null-bearing input, BIT-exact") {
    val df = nullDf
    def names = Seq("v_q1_w4", "v_med_w4", "v_q3_w4")
    val a = withAgg(true) { bitsOf(TimeOps.rollQuantiles(df, "v", G, O, w = 4), names) }
    val d = withAgg(false) { bitsOf(TimeOps.rollQuantiles(df, "v", G, O, w = 4), names) }
    assert(a == d)
  }

  test("multi-column fused rolls (ts_pipeline_multi shape) agg ≡ two-step") {
    val rng = new scala.util.Random(31)
    val df = (for (g <- 0 until 3; t <- 0 until 35) yield
      (g, t, rng.nextDouble() * 10, rng.nextDouble() * 5)).toDF("g", "t", "v", "v2")
    val feats = Seq(
      Featurize.Lag(Seq("v", "v2"), Seq(1, 3)),
      Featurize.Rollmean(Seq("v", "v2"), Seq(4, 9)))
    val a = withAgg(true) {
      val r = Featurize.featurizeData(df, G, O, feats)
      bitsOf(r.df, r.featureNames)
    }
    val d = withAgg(false) {
      val r = Featurize.featurizeData(df, G, O, feats)
      bitsOf(r.df, r.featureNames)
    }
    assert(a == d)
  }
}
