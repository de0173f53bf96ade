package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r9 A/B (VERDICT r8 item 6): multi-column roll families now default
  * to per-(column, depth) BARE frames instead of one wrapped array
  * frame. The two encodings must be value-identical — including nulls,
  * NaNs, and short groups — and cross-column specs must still force
  * the wrapped frame.
  */
class SharedMultiFrameSpec extends SparkSpec {
  import spark.implicits._

  private val nan = Double.NaN
  private lazy val df = (for (g <- Seq(1, 2); i <- 0 until 40) yield {
    val v: java.lang.Double =
      if ((i + g) % 9 == 0) null else if (i % 13 == 0) nan else (i * 3 + g).toDouble
    val w: java.lang.Double = if (i % 7 == 0) null else (i * 2 - g).toDouble
    (g, i.toLong, v, w)
  }).toDF("g", "t", "v", "w")

  private def feats = Seq(
    Featurize.Lag(Seq("v", "w"), Seq(1, 3)),
    Featurize.Rollmean(Seq("v", "w"), Seq(4, 9)))

  private def run(split: Boolean) = {
    spark.conf.set("spark.graft.roll.bareSplit", split.toString)
    try {
      val r = Featurize.featurizeData(df, Seq("g"), Seq("t"), feats)
      val cols = Seq("g", "t") ++ r.featureNames
      // doubles → bit patterns: NaN must compare EQUAL to itself here
      // (lag features legitimately carry NaN through)
      (r.featureNames,
        r.df.orderBy("g", "t").select(cols.map(col): _*).collect().map(_.toSeq.map {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case x         => x
        }).toSeq)
    } finally spark.conf.unset("spark.graft.roll.bareSplit")
  }

  test("per-column bare split == wrapped frame on nulls, NaNs, and short groups") {
    val (namesS, split) = run(split = true)
    val (namesW, wrapped) = run(split = false)
    assert(namesS == namesW)
    assert(split == wrapped)
  }

  test("split plans one Window operator (frames share it) and no array allocation") {
    spark.conf.set("spark.graft.roll.bareSplit", "true")
    try {
      val qe = Featurize.featurizeData(df, Seq("g"), Seq("t"), feats).df.queryExecution
      val windows = "\\bWindow \\[".r.findAllIn(qe.executedPlan.toString).length
      assert(windows == 1,
        s"all bare frames must ride ONE Window operator, saw $windows:\n${qe.executedPlan.toString.take(2000)}")
      // the optimized logical plan shows the frame elements before
      // LocalTableScan folding: no array() element construction
      assert(!qe.optimizedPlan.toString.contains("collect_list(array("),
        "split path must not build array elements")
    } finally spark.conf.unset("spark.graft.roll.bareSplit")
  }

  test("cross-column specs still read both columns in one pass") {
    // r22: the default route is the multi-child frame-fold aggregate
    // (MultiRollAgg over NaN-encoded v AND w — no frame array at all);
    // with frameAgg=false the wrapped collect_list(array(v, w)) frame
    // is restored. Both shapes read the two columns through ONE window
    // pass.
    val r = Featurize.crossCorr(df, "v", "w", Seq("g"), Seq("t"), w = 5)
    val plan = r.df.queryExecution.analyzed.toString
    assert(plan.contains("multirollagg"),
      s"mode-6 cross-corr defaults to the multi-column aggregate:\n${plan.take(2000)}")
    spark.conf.set("spark.graft.frameAgg", "false")
    try {
      val r2 = Featurize.crossCorr(df, "v", "w", Seq("g"), Seq("t"), w = 5)
      val plan2 = r2.df.queryExecution.analyzed.toString
      assert(plan2.contains("array("),
        s"frameAgg=false must restore the wrapped frame:\n${plan2.take(2000)}")
    } finally spark.conf.unset("spark.graft.frameAgg")
  }
}
