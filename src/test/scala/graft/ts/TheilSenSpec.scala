package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TimeOps.theilSen — median pairwise slope robust trend. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed: clean linear series recovers the exact slope") {
    // v = 2t: every pairwise slope is exactly 2
    val rows = (0L until 6L).map(t => (1L, t * 10L, (t * 20L).toDouble))
    val out = TimeOps.theilSen(rows.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id")).collect().head
    assert(out.getLong(1) == 15L && out.getDouble(2) == 2.0, out.toString)
  }

  test("robustness: one wild outlier leaves the median slope intact (OLS would break)") {
    val clean = (0L until 11L).map(t => (1L, t, t.toDouble)) // slope 1
    // outlier at the END: max leverage (one at the x-mean would leave
    // the OLS slope untouched — zero leverage at the centroid)
    val spiked = clean.updated(10, (1L, 10L, 1.0e6))
    val sen = TimeOps.theilSen(spiked.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id")).collect().head.getDouble(2)
    assert(sen == 1.0, s"median slope must shrug off the outlier: $sen")
    // the OLS slope on the same data is wildly wrong — the contrast
    // theilSen exists for
    val ols = {
      val n = spiked.size.toDouble
      val sx = spiked.map(_._2.toDouble).sum; val sy = spiked.map(_._3).sum
      val sxy = spiked.map(r => r._2.toDouble * r._3).sum
      val sxx = spiked.map(r => r._2.toDouble * r._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(math.abs(ols - 1.0) > 1000, s"OLS should be destroyed here: $ols")
  }

  test("pairFrac sampling: deterministic, ≈frac of pairs kept, clean-series slope exact") {
    val rows = (0L until 60L).map(t => (1L, t * 1000L, 2.0 * t))
    val df = rows.toDF("user_id", "ts_us", "value")
    val exact = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id")).collect().head
    assert(exact.getLong(1) == 1770L)
    val s1 = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), Some(0.25)).collect().head
    val s2 = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), Some(0.25)).collect().head
    assert(s1.getLong(1) == s2.getLong(1) && s1.getDouble(2) == s2.getDouble(2),
      "hash sampling must be reproducible")
    // every pairwise slope of this clean series is identical, so the
    // sampled median equals the exact one bit-for-bit
    assert(s1.getDouble(2) == exact.getDouble(2), s"sampled slope ${s1.getDouble(2)}")
    val kept = s1.getLong(1).toDouble / 1770.0
    assert(kept > 0.15 && kept < 0.35, s"~25% of pairs must survive, got $kept")
  }

  test("bounded median: slopes never land in an agg buffer on EITHER route (long series)") {
    // r11 scale killer: all O(n²/2) pair SLOPES of a series landed in
    // ONE sort_array(collect_list(...)) aggregation buffer — on-heap,
    // unbounded, non-spillable. The two current routes each avoid it
    // differently and BOTH must match a brute-force lower median:
    // - exact route (autoMaxPairs = None): pair join + WindowExec rank
    //   pick (spillable external row array, no slope agg buffer);
    // - kernel route (the default): collect_list of sampler-BOUNDED
    //   POINTS (≤ budget rows, not O(n²/2) slopes) into one
    //   whole-series kernel — the pair scratch is transient in-kernel.
    val n = 400 // 79,800 pair slopes
    val rows = (0 until n).map { t =>
      // deterministic noise, no RNG: slope 3 plus a bounded wobble
      (1L, t.toLong, 3.0 * t + ((t * 2654435761L) % 97L).toDouble / 97.0)
    }
    val df = rows.toDF("user_id", "ts_us", "value")
    val slopes = (for {
      i <- 0 until n; j <- (i + 1) until n
    } yield (rows(j)._3 - rows(i)._3) / (j - i).toDouble).sorted
    val exact = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None)
    val ePlan = exact.queryExecution.executedPlan.toString
    assert(!ePlan.contains("collect_list") && !ePlan.contains("sort_array"),
      s"exact route must not buffer slopes in an agg:\n${ePlan.take(1500)}")
    assert(ePlan.toLowerCase.contains("windowspecdefinition"),
      s"exact-route rank pick must ride WindowExec (spillable):\n${ePlan.take(1500)}")
    val eOut = exact.collect().head
    assert(eOut.getLong(1) == slopes.size.toLong)
    assert(eOut.getDouble(2) == slopes((slopes.size + 1) / 2 - 1),
      s"window rank pick must equal brute-force lower median: $eOut")
    // kernel route: same verdict (400 points « 4472 budget → all kept)
    val kOut = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id")).collect().head
    assert(kOut.getLong(1) == eOut.getLong(1) && kOut.getDouble(2) == eOut.getDouble(2),
      s"kernel route diverged: $kOut vs $eOut")
  }

  test("full line: Sen's intercept recovers the clean line and shrugs off an outlier") {
    // v = 5 + 3t exactly: slope 3, every residual exactly 5
    val clean = (0L until 9L).map(t => (1L, t, 5.0 + 3.0 * t))
    val line = TimeOps.theilSenLine(clean.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id")).collect().head
    assert(line.getDouble(2) == 3.0 && line.getDouble(3) == 5.0, line.toString)
    // one wild point: slope median and residual median both robust
    val spiked = clean.updated(4, (1L, 4L, 1.0e7))
    val r = TimeOps.theilSenLine(spiked.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id")).collect().head
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 5.0,
      s"robust line must ignore the outlier: $r")
  }

  test("type-1 median: even pair count picks the lower middle element") {
    // 2 points per series -> 1 pair; 3 points -> 3 pairs, median = 2nd
    val rows = Seq((1L, 0L, 0.0), (1L, 1L, 1.0), (1L, 2L, 5.0))
    // slopes: (0,1)=1, (1,2)=4, (0,2)=2.5 -> sorted [1, 2.5, 4], rank ceil(3/2)=2 -> 2.5
    val out = TimeOps.theilSen(rows.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id")).collect().head
    assert(out.getLong(1) == 3L && out.getDouble(2) == 2.5, out.toString)
  }

  test("overflow guard: the 32-bit rank assert survives optimization (loud, not silent)") {
    // A >2^31-pair series can't be materialized in a test; what CAN
    // regress silently is the optimizer folding the assert_true away
    // (its .isNull conjunct is the only thing keeping it in the
    // filter). Pin that BOTH the slope and line plans still carry the
    // assert after optimization, so an out-of-contract series raises
    // instead of vanishing (advisor r12: cast-to-int rank matched no
    // row and dropped the series).
    // the guard lives on the JOIN route (autoMaxPairs = None) — the
    // kernel route is structurally under 2^31 pairs (sampler-bounded)
    val df = (0L until 5L).map(t => (1L, t, t.toDouble)).toDF("user_id", "ts_us", "value")
    for (plan <- Seq(
        TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None),
        TimeOps.theilSenLine(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None))) {
      // assert_true lowers to `if (cond) true else isnull(raise_error(…))`
      val optimized = plan.queryExecution.optimizedPlan.toString
      assert(optimized.contains("raise_error"),
        s"rank-overflow assert was optimized away:\n$optimized")
    }
  }
}
