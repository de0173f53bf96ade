package graft.plans

import graft.SparkSpec
import graft.ts.Featurize
import org.apache.spark.sql.functions._

/** Value parity of the fused multi-column kernel against the dedicated
  * single-column kernels / expression forms, plus the scale property it
  * exists for: ONE window aggregation buffer for the whole family.
  */
class MultiRollKernelSpec extends SparkSpec {
  import spark.implicits._

  private def df2 = {
    val rng = new scala.util.Random(7)
    (for (g <- 0 until 3; t <- 0 until 60)
      yield (g, t, math.sin(t * 0.3) + g + rng.nextDouble() * 0.1,
        math.cos(t * 0.17) * 2 - g + rng.nextDouble() * 0.1))
      .toDF("g", "t", "v", "u")
  }

  test("fused rollmean over 2 columns x 2 windows equals the expression form") {
    val d = df2
    val fused = Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(5, 9))
    val expr = Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(5, 9), useKernel = false)
    assert(fused.featureNames == expr.featureNames)
    val cols = Seq("g", "t") ++ fused.featureNames
    val a = fused.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    val b = expr.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    assert(a == b)
  }

  test("fused rollmean skips nulls exactly like the coalesce+count expression form") {
    val d = df2.withColumn("v", when($"t" % 7 === 0, lit(null)).otherwise($"v"))
      .withColumn("u", when($"t" % 11 === 3, lit(null)).otherwise($"u"))
    val fused = Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(5), Some(2))
    val expr = Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(5), Some(2), useKernel = false)
    val cols = Seq("g", "t") ++ fused.featureNames
    val a = fused.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    val b = expr.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    assert(a == b)
  }

  test("fused rollstats over 2 columns equals the expression form") {
    val d = df2
    val fused = Featurize.rollStats(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(6))
    val expr = Featurize.rollStats(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(6), useKernel = false)
    assert(fused.featureNames == expr.featureNames)
    val cols = Seq("g", "t") ++ fused.featureNames
    val a = fused.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    val b = expr.df.orderBy("g", "t").select(cols.map(col): _*).collect().toSeq
    assert(a == b)
  }

  test("a 2-column pipeline plans ONE Window, ONE exchange, per-column bare frames") {
    // Default (r22): one frame-fold AGGREGATE per (column, depth)
    // rollmean family — 4 here, zero frame arrays — all riding ONE
    // Window op over ONE hash exchange. frameAgg=false restores the
    // r21 per-(column, depth) primitive collectors (the measured r9
    // bareSplit winner), and bareSplit=false under it the single
    // wrapped array frame.
    def shape(): (Int, Int, Int, Int) = {
      val res = Featurize.featurizeData(df2, Seq("g"), Seq("t"), Seq(
        Featurize.Lag(Seq("v", "u"), Seq(1, 3)),
        Featurize.Rollmean(Seq("v", "u"), Seq(5, 9)),
        Featurize.HorizonTargets(Seq("v"), Seq(2), "wide")))
      val plan = res.df.queryExecution.executedPlan.toString
      ("(?m)^\\s*(?:\\+- )?Window ".r.findAllIn(plan).length,
        "doubleframecollect".r.findAllIn(plan).length +
          "collect_list".r.findAllIn(plan).length,
        "Exchange hashpartitioning".r.findAllIn(plan).length,
        "multirollagg".r.findAllIn(plan).length)
    }
    val (windows, buffers, hashExchanges, aggs) = shape()
    assert(windows == 1, s"expected ONE Window op, got $windows")
    assert(buffers == 0, s"aggregate mode must plan ZERO frame arrays, got $buffers")
    assert(aggs == 4,
      s"expected one fold aggregate per (column, w) rollmean — 4 — got $aggs")
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges")
    spark.conf.set("spark.graft.frameAgg", "false")
    try {
      val (w1, b1, e1, a1) = shape()
      assert(w1 == 1 && e1 == 1, s"collector mode must keep 1 Window/1 exchange, got $w1/$e1")
      assert(b1 == 4 && a1 == 0,
        s"frameAgg=false must restore one bare frame per (column, w) — 4 — got $b1/$a1")
      spark.conf.set("spark.graft.roll.bareSplit", "false")
      val (w2, b2, e2, _) = shape()
      assert(w2 == 1 && e2 == 1, s"wrapped mode must keep 1 Window/1 exchange, got $w2/$e2")
      assert(b2 == 1, s"bareSplit=false must restore ONE wrapped frame, got $b2")
    } finally {
      spark.conf.unset("spark.graft.roll.bareSplit")
      spark.conf.unset("spark.graft.frameAgg")
    }
  }

  test("mixed-mode specs against one frame equal their dedicated kernels") {
    val d = df2
    val win = Featurize.seriesWindow(Seq("g"), Seq("t"))
    // dedicated kernels, each with its own frame
    val single = d.select(col("g"), col("t"),
      element_at(RollFoldKernel.rollmean(
        collect_list($"v".cast("double")).over(win.rowsBetween(-4, 0)), 5, 5), 1).as("m"),
      element_at(RollFoldKernel.zscore(
        collect_list($"u".cast("double")).over(win.rowsBetween(-7, 0)), $"u".cast("double"), 8), 1).as("z"),
      element_at(RollFoldKernel.autocorr(
        collect_list($"v".cast("double")).over(win.rowsBetween(-(6 + 2 - 1), 0)), 6, 2), 1).as("a"),
      element_at(RollFoldKernel.moments(
        collect_list($"u".cast("double")).over(win.rowsBetween(-9, 0)), 10), 1).as("sk"))
    // one fused frame for all four
    val specs = Seq(
      RollSpecDef(0, 0, 5, 5, 0, Array.empty),
      RollSpecDef(2, 1, 8, 8, 0, Array.empty),
      RollSpecDef(4, 0, 6, 6, 2, Array.empty),
      RollSpecDef(5, 1, 10, 10, 0, RollFoldKernel.momentCoefs(10)))
    val depth = specs.map(_.depth).max
    val xs = collect_list(array($"v".cast("double"), $"u".cast("double")))
      .over(win.rowsBetween(-(depth - 1), 0))
    val fused = d.select(col("g"), col("t"), MultiRollKernel.of(xs, specs).as("r"))
      .select(col("g"), col("t"),
        element_at($"r", 1).as("m"), element_at($"r", 2).as("z"),
        element_at($"r", 3).as("a"), element_at($"r", 4).as("sk"))
    val a = single.orderBy("g", "t").collect().toSeq
    val b = fused.orderBy("g", "t").collect().toSeq
    assert(a == b)
  }
}
