package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pins the r19 whole-series aggregation kernels
  * (graft.plans.TheilSenAggKernel / MannKendallAggKernel) BIT-EQUAL to
  * the pair-join route they replaced on the auto path, across
  * adversarial series shapes: 1/2-point series, tied timestamps, tied
  * values, constant series, inexact fractional doubles, null values,
  * null timestamps, and the deterministic pairFrac hash filter. The
  * exact route (autoMaxPairs = None) still plans the join, so the two
  * routes are mutually checkable on any in-budget frame — every series
  * here is far under the point budget, where the sampler keeps all
  * rows and the routes MUST agree to the last bit.
  */
class TheilSenKernelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** Adversarial multi-series frame: deterministic (no RNG seed drift),
    * mixes clean grids, irregular gaps, tied ts, tied v, constants,
    * fractional values whose differences are NOT exactly representable,
    * plus null-v and null-ts rows (out of the operator contract, but
    * the kernel must still mirror the join's null algebra).
    */
  private def frame(): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    def add(u: Long, t: java.lang.Long, v: java.lang.Double): Unit =
      rows += Row(u, t, v)
    // u1: single point (no pairs — absent from output on both routes)
    add(1L, 10L, 5.5)
    // u2: two points
    add(2L, 10L, 1.1); add(2L, 70L, 2.3)
    // u3: 60-point irregular grid, fractional values (0.01 steps are
    // inexact doubles; differences round)
    for (i <- 0 until 60) {
      val t = i.toLong * 17L + (i % 7).toLong
      add(3L, t * 1000L, i.toDouble * 0.07 + (i % 11).toDouble * 1.13 - 20.0)
    }
    // u4: constant values (every slope 0.0, every sign a tie)
    for (i <- 0 until 25) add(4L, i.toLong * 60L, 7.5)
    // u5: tied timestamps (three runs of 3) — pairs inside a run are
    // excluded by the strict < on both routes
    for (i <- 0 until 21) add(5L, (i / 3).toLong * 100L, i.toDouble * 0.31)
    // u6: tied values on distinct ts (sign 0 pairs; equal slopes)
    for (i <- 0 until 30) add(6L, i.toLong * 10L, (i % 5).toDouble)
    // u7: null values sprinkled into a real series (null slopes sort
    // first on both routes; sum skips null signs)
    for (i <- 0 until 20)
      add(7L, i.toLong * 50L, if (i % 6 == 3) null else i.toDouble * 2.5 - 3.7)
    // u8: ALL values null (s_stat must be NULL, slope NULL — rows still
    // pair on ts)
    for (i <- 0 until 8) add(8L, i.toLong * 9L, null)
    // u9: null timestamps mixed in (those rows join no pair but count
    // toward the intercept rank's n on both routes)
    for (i <- 0 until 15)
      add(9L, if (i % 5 == 2) null else i.toLong * 30L + 1L, i.toDouble * 1.01)
    // u10: big negative/positive ts (floorMod vs % in the pair hash)
    for (i <- 0 until 40) add(10L, i.toLong * 977L - 15000L, 100.0 - i.toDouble * 0.99)
    // u11: wild magnitudes (1e12 offsets — cancellation-prone diffs)
    for (i <- 0 until 30) add(11L, i.toLong * 41L, 1.0e12 + i.toDouble * 0.125 + (i % 3).toDouble)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 3), schema)
  }

  private def key(r: Row): Long = r.getLong(0)
  private def rest(r: Row): Seq[Any] = r.toSeq.drop(1)

  private def compareRoutes(kernel: DataFrame, join: DataFrame, clue: String): Unit = {
    val k = kernel.collect().map(r => key(r) -> rest(r)).toMap
    val j = join.collect().map(r => key(r) -> rest(r)).toMap
    assert(k.keySet == j.keySet, s"$clue: series sets differ: ${k.keySet} vs ${j.keySet}")
    for ((u, kv) <- k) {
      val jv = j(u)
      assert(kv == jv, s"$clue user $u: kernel $kv != join $jv")
    }
  }

  // The join-route comparator: a budget past KernelPointCap keeps the
  // pair JOIN while engaging the IDENTICAL sampler — so null-ts rows
  // (which the sampler's keep-filter drops) are excluded on both
  // sides and every remaining difference would be the kernel's fault.
  // (Sampler-free equality vs autoMaxPairs = None is pinned separately
  // on the null-free frames below and in TheilSenAutoSpec.)
  private val joinRoute = Some(Int.MaxValue.toLong - 1)

  test("theilSen: kernel route ≡ join route to the last bit on adversarial frames") {
    val df = frame()
    compareRoutes(
      TimeOps.theilSen(df, "value", "ts_us", Seq("user_id")), // default budget → kernel
      TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = joinRoute),
      "theilSen")
    // and on the null-ts-free series the sampler is a no-op, so the
    // kernel must ALSO equal the fully exact route
    val clean = df.where("ts_us is not null")
    compareRoutes(
      TimeOps.theilSen(clean, "value", "ts_us", Seq("user_id")),
      TimeOps.theilSen(clean, "value", "ts_us", Seq("user_id"), autoMaxPairs = None),
      "theilSen exact")
  }

  test("theilSen with pairFrac: the in-kernel pair hash keeps the identical pair set") {
    val df = frame()
    for (f <- Seq(0.1, 0.25, 0.6, 1.0)) {
      compareRoutes(
        TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), pairFrac = Some(f)),
        TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), pairFrac = Some(f),
          autoMaxPairs = joinRoute),
        s"theilSen pairFrac=$f")
    }
  }

  test("theilSenLine: slope AND intercept bit-equal across routes") {
    val df = frame()
    compareRoutes(
      TimeOps.theilSenLine(df, "value", "ts_us", Seq("user_id")),
      TimeOps.theilSenLine(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = joinRoute),
      "theilSenLine")
  }

  test("mannKendall: inversion-count S ≡ pair-join S (integers) across routes") {
    val df = frame()
    compareRoutes(
      TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id")),
      TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = joinRoute),
      "mannKendall")
  }

  test("randomized sweep: 200 series of fuzzed shape agree across routes") {
    val rnd = new scala.util.Random(20260816L)
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    for (u <- 0 until 200) {
      val n = 1 + rnd.nextInt(40)
      val tieTs = rnd.nextInt(4) == 0
      val tieV = rnd.nextInt(3) == 0
      val nullV = rnd.nextInt(5) == 0
      var t = rnd.nextInt(1000).toLong
      for (i <- 0 until n) {
        t += (if (tieTs && rnd.nextInt(3) == 0) 0L else 1L + rnd.nextInt(500).toLong)
        val v: java.lang.Double =
          if (nullV && rnd.nextInt(6) == 0) null
          else if (tieV) rnd.nextInt(4).toDouble * 1.37
          else rnd.nextDouble() * 200.0 - 100.0
        rows += Row(u.toLong + 100L, java.lang.Long.valueOf(t), v)
      }
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)
    compareRoutes(
      TimeOps.theilSen(df, "value", "ts_us", Seq("user_id")),
      TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None),
      "fuzz theilSen")
    compareRoutes(
      TimeOps.theilSenLine(df, "value", "ts_us", Seq("user_id")),
      TimeOps.theilSenLine(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None),
      "fuzz theilSenLine")
    compareRoutes(
      TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id")),
      TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None),
      "fuzz mannKendall")
  }

  test("plan pins: kernel route has NO join and NO window; exact route keeps both") {
    val df = frame()
    def joins(p: String): Int = "(?i)[a-z]*hashjoin|sortmergejoin".r.findAllIn(p).size
    def planOf(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).toLowerCase
    val kPlan = planOf(TimeOps.theilSen(df, "value", "ts_us", Seq("user_id")))
    // the ONE remaining join is the sampler's per-series count join
    // (formatted mode mentions each node twice: tree + details);
    // the O(n²/2) pair self-join is gone
    assert(joins(kPlan) <= 2, s"kernel route must shed the pair join:\n${kPlan.take(1500)}")
    assert(!kPlan.contains("windowspecdefinition"),
      s"kernel route must not plan a window:\n${kPlan.take(1500)}")
    assert(kPlan.contains("theilsenaggkernel"),
      s"kernel missing from plan:\n${kPlan.take(1500)}")
    val jPlan = planOf(TimeOps.theilSen(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None))
    // the exact route's join is the PAIR join (no sampler): window +
    // join both present is the spillable shape the kernel replaced
    assert(joins(jPlan) >= 2 && jPlan.contains("windowspecdefinition"),
      s"exact route must keep the spillable join+window shape:\n${jPlan.take(1500)}")
    // mannKendall kernel: ONE aggregate computes n_obs and the kernel
    // struct together — the pair join AND the n_obs join are both gone
    val mkPlan = planOf(TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id")))
    assert(joins(mkPlan) <= 2, s"MK kernel route keeps only the sampler join:\n${mkPlan.take(1500)}")
    assert(mkPlan.contains("mannkendallaggkernel"),
      s"MK kernel missing from plan:\n${mkPlan.take(1500)}")
  }
}
