package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the monster-series AUTO-ROUTE (TimeOps.sampleSeriesPoints via
  * autoMaxPairs): an out-of-budget series degrades to the consistent
  * point-sampled Theil-Sen / Mann-Kendall estimator instead of an
  * O(n²) pair fan-out or a failed job, while in-budget series stay
  * bit-exact (the integer keep-threshold passes every row when
  * n ≤ ⌊√(2·budget)⌋).
  */
class TheilSenAutoSpec extends SparkSpec {
  import spark.implicits._

  // budget 1000 pairs → 44-point budget (⌊√2000⌋)
  private val budget = Some(1000L)

  test("pointBudget leaves 8-sd headroom under the 2^31 rank ceiling") {
    // small explicit budgets are bit-exactly the old ⌊√(2·mp)⌋ —
    // gates pass Some(1000L) and their oracles inline 44 points
    assert(TimeOps.pointBudget(1000L) == 44L)
    assert(TimeOps.pointBudget(100L) == 14L)
    assert(TimeOps.pointBudget(3L) == 2L)
    // the default budget clamps: raw ⌊√(2·(2³¹−1))⌋ = 65535 left ZERO
    // margin against kept-count fluctuation (sd ≈ √budget ≈ 252; the
    // rank guard trips at 65537 kept points). 63488 = 65536 − 8·√65536
    // puts the ceiling ~8 sd away for ANY budget
    assert(TimeOps.pointBudget(Int.MaxValue.toLong - 1) == 63488L)
    assert(TimeOps.pointBudget(Long.MaxValue / 4) == 63488L)
    // headroom arithmetic: even budget + 8 sd of kept points stays
    // under the 65536-point pair ceiling (65536·65535/2 < 2³¹)
    val b = TimeOps.pointBudget(Int.MaxValue.toLong - 1)
    val worst = b + 8L * math.sqrt(b.toDouble).ceil.toLong
    assert(worst * (worst - 1) / 2 < Int.MaxValue.toLong, s"b=$b worst=$worst")
  }

  test("the DEFAULT budget is a time-bounded performance budget (r19)") {
    // SCALING.md r18: at the old correctness-maximal default (2³¹−2 →
    // 63488 points → ~2·10⁹ pairs) a genuine 10⁵-point series was ONE
    // >100-min join task. The default is now 10⁷ pairs: worst case
    // 4472 points ⇒ 4472·4471/2 ≈ 10⁷ pairs ≈ 30 s single-task at the
    // measured 320-350k pairs/s. Pins: the point budget, the
    // worst-case pair count staying inside ~10⁷, and the
    // correctness-maximal budget remaining reachable explicitly.
    assert(TimeOps.AutoMaxPairsDefault == 10000000L)
    val b = TimeOps.pointBudget(TimeOps.AutoMaxPairsDefault)
    assert(b == 4472L, s"default point budget drifted: $b")
    // nominal pairs stay inside the 10⁷ budget...
    assert(b * (b - 1) / 2 <= 10000000L, s"nominal pairs: ${b * (b - 1) / 2}")
    // ...and even +8 sd of kept-count fluctuation (points scale with
    // √: pairs grow ~(1+8/√b)² ≈ 1.25×) keeps the worst-case series
    // around ~40 s single-task at the measured 320-350k pairs/s —
    // nowhere near the old default's ~2·10⁹-pair, >100-min kill
    val worst = b + 8L * math.sqrt(b.toDouble).ceil.toLong
    assert(worst * (worst - 1) / 2 <= 13000000L, s"worst-case pairs: $worst")
    // the maximal budget is still one explicit argument away
    assert(TimeOps.pointBudget(Int.MaxValue.toLong - 1) == 63488L)
  }

  test("the default is BIT-IDENTICAL to the exact path on gate-scale series") {
    // every sf0.001 series is ≤ 88 points « 4472, so theilSen/
    // mannKendall WITH NO ARGUMENTS must equal autoMaxPairs = None to
    // the last bit — this is what keeps the plain ts_theilsen /
    // ts_mannkendall oracles (exact all-pairs SQL, no sampler) valid
    // under the r19 default change
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("value"))
    val d = TimeOps.theilSen(ev, "value", "ts_us", Seq("user_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val e = TimeOps.theilSen(ev, "value", "ts_us", Seq("user_id"), autoMaxPairs = None)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(d == e, s"default diverged from exact on in-budget series")
    val dm = TimeOps.mannKendall(ev, "value", "ts_us", Seq("user_id"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val em = TimeOps.mannKendall(ev, "value", "ts_us", Seq("user_id"), autoMaxPairs = None)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(dm == em)
  }

  test("monster series auto-samples: bounded pairs, exact slope on clean linear data") {
    // 500 points, v = 2t exactly: EVERY pairwise slope is 2, so any
    // subsample's median is bit-exactly 2.0 — the sampling is visible
    // only in n_pairs (124,750 exact vs ≤ ~46·45/2 sampled)
    val rows = (0L until 500L).map(t => (1L, t * 1000L, (t * 2000L).toDouble))
    val df = rows.toDF("user_id", "ts_us", "value")
    val out = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"),
      autoMaxPairs = budget).collect().head
    assert(out.getDouble(2) == 2.0, s"sampled median slope must stay exact: $out")
    val nPairs = out.getLong(1)
    assert(nPairs < 124750L, s"monster series must not run all pairs: $nPairs")
    // expected kept points ≈ 44; the hash keep-rule is uniform enough
    // that the pair count lands well inside [10·9/2, 90·89/2]
    assert(nPairs > 45L && nPairs < 4005L, s"kept-pair band: $nPairs")
    // deterministic: the integer hash rule has no RNG
    val again = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"),
      autoMaxPairs = budget).collect().head
    assert(again.getLong(1) == nPairs && again.getDouble(2) == 2.0)
  }

  test("in-budget series are BIT-IDENTICAL to the exact path") {
    // 40 points < 44-point budget: threshold (44·P) div 40 > P keeps
    // every row, so auto and exact must agree to the last bit
    val rnd = new scala.util.Random(77)
    val rows = (0L until 40L).map(t => (1L, t * 7L + 3L, rnd.nextDouble() * 100 - 50))
    val df = rows.toDF("user_id", "ts_us", "value")
    val exact = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"),
      autoMaxPairs = None).collect().head
    val auto = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"),
      autoMaxPairs = budget).collect().head
    assert(auto.getLong(1) == exact.getLong(1) &&
      auto.getDouble(2) == exact.getDouble(2), s"$auto vs $exact")
  }

  test("mixed frame: each series routes independently (small exact, monster sampled)") {
    val small = (0L until 30L).map(t => (1L, t * 10L, t.toDouble * 30))
    val monster = (0L until 300L).map(t => (2L, t * 13L, t.toDouble * 65))
    val df = (small ++ monster).toDF("user_id", "ts_us", "value")
    val out = TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = budget)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 435L, s"small series must keep all 30·29/2 pairs: ${out(1L)}")
    assert(out(2L).getLong(1) < 44850L, s"monster series must sample: ${out(2L)}")
    assert(out(1L).getDouble(2) == 3.0 && out(2L).getDouble(2) == 5.0)
  }

  test("mannKendall auto: sampled statistic stays internally consistent") {
    // strictly increasing monster series: every pair sign is +1, so
    // S = n_pairs and the unique-ts contract invariant
    // n_pairs = n_obs·(n_obs−1)/2 must hold ON THE SUBSAMPLE too
    val rows = (0L until 400L).map(t => (9L, t * 11L, t.toDouble))
    val out = TimeOps.mannKendall(rows.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id"), autoMaxPairs = budget).collect().head
    val nObs = out.getLong(1); val nPairs = out.getLong(2); val s = out.getLong(3)
    assert(nObs < 400L, s"monster series must sample: n_obs=$nObs")
    assert(nPairs == nObs * (nObs - 1) / 2, s"subsample contract: $out")
    assert(s == nPairs && out.getDouble(4) > 0.0, s"monotone series: $out")
  }

  test("theilSenLine auto: ONE shared subsample feeds slope and intercept") {
    // v = 5 + 3t exactly: slope 3 and every residual 5 on ANY subsample
    val rows = (0L until 350L).map(t => (1L, t * 3L, 5.0 + 3.0 * t * 3L))
    val out = TimeOps.theilSenLine(rows.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id"), autoMaxPairs = budget).collect().head
    assert(out.getLong(1) < 61075L, s"sampled: $out")
    assert(out.getDouble(2) == 3.0 && out.getDouble(3) == 5.0, out.toString)
  }

  test("plan pin on sf0.001 parquet: the keep-filter and count join survive optimization") {
    // Seq.toDF inputs constant-fold to LocalRelation and the sampler
    // would vanish from the plan (the LocalRelation trap) — pin the
    // shape on a real parquet read: the integer keep-rule's 1000033
    // multiplier in a Filter, the per-series count aggregate feeding
    // it, and a SAMPLED verdict (fewer pairs than the exact route) on
    // the same data
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("value"))
    val q = TimeOps.theilSen(ev, "value", "ts_us", Seq("user_id"), autoMaxPairs = Some(100L))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("1000033"), s"keep-filter folded away:\n${plan.take(2000)}")
    assert(plan.toLowerCase.contains("aggregate"), "per-series count agg missing")
    val auto = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = TimeOps.theilSen(ev, "value", "ts_us", Seq("user_id"), autoMaxPairs = None)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // budget 100 pairs → 14-point budget; every sf0.001 series is
    // longer than that, so every series must show fewer pairs
    assert(auto.nonEmpty && auto.forall { case (u, n) => n < exact(u) },
      s"every series must route to the sampled path: ${auto.take(3)} vs ${exact.take(3)}")
  }
}
