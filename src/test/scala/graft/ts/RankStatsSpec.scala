package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pins the rank-statistics kernel family (graft.plans
  * .RankStatsAggKernel → TimeOps.spearman / pettitt / runsTest)
  * against O(n²) brute-force references computed in plain Scala:
  * Spearman's tie-corrected ρ vs Pearson-on-average-ranks, Pettitt's
  * rank-form K/changepoint vs the literal double-sum sign statistic,
  * and the runs count vs a direct sign scan. Adversarial shapes:
  * 1/2-point series, constant series, tied values (count data), NaN
  * and ±0.0 values, 1e12 magnitudes, null values/timestamps, and the
  * closed-form verdicts on monotone / alternating series.
  */
class RankStatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)

  private def series(rows: Seq[(Long, Double)]): DataFrame =
    df(rows.zipWithIndex.map { case ((t, v), _) => Row(1L, java.lang.Long.valueOf(t), java.lang.Double.valueOf(v)) })

  // ---- brute-force references (complete cases, time order) ----

  /** Pearson correlation of tie-averaged ranks, straight double math. */
  private def refSpearman(pts: Seq[(Long, Double)]): Option[Double] = {
    val n = pts.size
    if (n == 0) return None
    val byT = pts.sortBy(_._1)
    def avgRanks(keys: Seq[Double]): Seq[Double] = {
      val sorted = keys.zipWithIndex.sortBy(_._1)
      val r = new Array[Double](n)
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n && sorted(b)._1 == sorted(a)._1) b += 1
        val avg = (a + 1 + b) / 2.0 // mean of ranks a+1..b
        for (k <- a until b) r(sorted(k)._2) = avg
        a = b
      }
      r.toSeq
    }
    val rx = avgRanks(byT.map(_._2))
    val rt = avgRanks(byT.map(_._1.toDouble))
    val mx = rx.sum / n; val mt = rt.sum / n
    val cov = rx.zip(rt).map { case (a, b) => (a - mx) * (b - mt) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vt = rt.map(b => (b - mt) * (b - mt)).sum
    if (vx == 0.0 || vt == 0.0) None else Some(cov / math.sqrt(vx * vt))
  }

  /** Literal Pettitt: U_t = Σ_{i≤t,j>t} sgn(x_j − x_i), K = max interior
    * |U_t|, first maximizing split's timestamp.
    */
  private def refPettitt(pts: Seq[(Long, Double)]): Option[(Long, Long)] = {
    val byT = pts.sortBy(_._1)
    val n = byT.size
    if (n < 2) return None
    var best = -1L; var bestT = 0L
    for (t <- 1 until n) {
      var u = 0L
      for (i <- 0 until t; j <- t until n)
        u += java.lang.Double.compare(byT(j)._2, byT(i)._2).sign
      if (math.abs(u) > best) { best = math.abs(u); bestT = byT(t - 1)._1 }
    }
    Some((best, bestT))
  }

  /** Direct runs scan about the lower median, equals discarded. */
  private def refRuns(pts: Seq[(Long, Double)]): (Long, Long, Long) = {
    val byT = pts.sortBy(_._1)
    val med = byT.map(_._2).sorted.apply((byT.size + 1) / 2 - 1)
    var above = 0L; var below = 0L; var runs = 0L; var prev = 0
    byT.foreach { case (_, v) =>
      if (v != med) {
        val s = if (v > med) 1 else -1
        if (s > 0) above += 1 else below += 1
        if (s != prev) runs += 1
        prev = s
      }
    }
    (above, below, runs)
  }

  private def spearmanRho(d: DataFrame): Option[Double] = {
    val rows = TimeOps.spearman(d, "value", "ts_us", Seq("user_id")).collect()
    assert(rows.length == 1)
    if (rows(0).isNullAt(rows(0).fieldIndex("rho"))) None
    else Some(rows(0).getAs[Double]("rho"))
  }

  // deterministic irregular count-ish series: heavy ties (mod 7),
  // epidemic-ish bursts, irregular time grid
  private def mkSeries(n: Int, seed: Int): Seq[(Long, Double)] =
    (0 until n).map { i =>
      val t = i.toLong * 3600L * 1000000L + (i % 5).toLong * 977L
      val v = ((i * seed + 13) % 7).toDouble + (if ((i * 31 + seed) % 11 == 0) 40.0 else 0.0)
      (t, v)
    }

  test("spearman matches Pearson-on-average-ranks brute force on tied count series") {
    for (seed <- Seq(3, 5, 9); n <- Seq(2, 3, 17, 80)) {
      val pts = mkSeries(n, seed)
      val got = spearmanRho(series(pts))
      val want = refSpearman(pts)
      assert(got.isDefined == want.isDefined, s"n=$n seed=$seed: $got vs $want")
      for (g <- got; w <- want)
        assert(math.abs(g - w) < 1e-12, s"n=$n seed=$seed: $g vs $w")
    }
  }

  test("spearman closed forms: monotone → 1, reversed → −1, constant → null") {
    val up = (0 until 30).map(i => (i.toLong * 100L, i.toDouble * 1.5 + 2))
    assert(spearmanRho(series(up)).contains(1.0))
    val down = up.map { case (t, v) => (t, -v) }
    assert(spearmanRho(series(down)).contains(-1.0))
    val const = (0 until 30).map(i => (i.toLong * 100L, 42.0))
    assert(spearmanRho(series(const)).isEmpty)
  }

  test("spearman is rank-exact at 1e12 magnitudes and merges ±0.0 ranks") {
    val shifted = (0 until 40).map(i => (i.toLong * 60L, 1.0e12 + ((i * 7) % 13).toDouble))
    val base = (0 until 40).map(i => (i.toLong * 60L, ((i * 7) % 13).toDouble))
    assert(spearmanRho(series(shifted)) == spearmanRho(series(base)),
      "rank statistics must be shift-invariant, even at 1e12")
    // −0.0 must tie with 0.0 (both engines' rank() does)
    val zer = Seq((0L, -0.0), (1L, 0.0), (2L, -0.0), (3L, 1.0), (4L, 2.0))
    val got = spearmanRho(series(zer))
    val want = refSpearman(zer.map { case (t, v) => (t, v + 0.0) })
    for (g <- got; w <- want) assert(math.abs(g - w) < 1e-12, s"$g vs $w")
  }

  test("pettitt matches the literal double-sum sign statistic (rank identity)") {
    for (seed <- Seq(3, 5, 9); n <- Seq(2, 3, 17, 60)) {
      val pts = mkSeries(n, seed)
      val rows = TimeOps.pettitt(series(pts), "value", "ts_us", Seq("user_id")).collect()
      val Some((k, cpT)) = refPettitt(pts): @unchecked
      assert(rows.length == 1, s"n=$n seed=$seed")
      assert(rows(0).getAs[Long]("k_stat") == k, s"n=$n seed=$seed")
      assert(rows(0).getAs[Long]("cp_t") == cpT, s"n=$n seed=$seed")
    }
  }

  test("pettitt finds an injected step and single-point series drop out") {
    // clean step: 30 low then 30 high — split must land on the boundary
    val step = (0 until 60).map(i => (i.toLong * 1000L, if (i < 30) 1.0 else 9.0))
    val r = TimeOps.pettitt(series(step), "value", "ts_us", Seq("user_id")).collect()
    assert(r(0).getAs[Long]("k_stat") == 30L * 30L,
      "clean step: every cross pair concordant, K = n1·n2 at the boundary")
    assert(r(0).getAs[Long]("cp_t") == 29L * 1000L)
    assert(r(0).getAs[Double]("p_value") == 0.0, "rounded p of a 60-point clean step is 0")
    val single = series(Seq((0L, 5.0)))
    assert(TimeOps.pettitt(single, "value", "ts_us", Seq("user_id")).count() == 0)
  }

  test("runs test matches the direct scan and flags clustering vs alternation") {
    for (seed <- Seq(3, 5, 9); n <- Seq(2, 3, 17, 60)) {
      val pts = mkSeries(n, seed)
      val rows = TimeOps.runsTest(series(pts), "value", "ts_us", Seq("user_id")).collect()
      val (above, below, runs) = refRuns(pts)
      if (above + below == 0) assert(rows.isEmpty, s"n=$n seed=$seed")
      else {
        assert(rows(0).getAs[Long]("n_above") == above, s"n=$n seed=$seed")
        assert(rows(0).getAs[Long]("n_below") == below, s"n=$n seed=$seed")
        assert(rows(0).getAs[Long]("runs") == runs, s"n=$n seed=$seed")
      }
    }
    // clustered: 20 low then 20 high (distinct values — binary data
    // degenerates: a whole side IS the median and gets discarded) →
    // 2 runs, strongly negative z
    val clustered = (0 until 40).map(i =>
      (i.toLong, if (i < 20) i.toDouble * 0.01 else 9.0 + i.toDouble * 0.01))
    val zc = TimeOps.runsTest(series(clustered), "value", "ts_us", Seq("user_id"))
      .collect()(0).getAs[Double]("z")
    assert(zc < -5.0, s"2 runs over 40 must be wildly non-random: $zc")
    // alternating: near-maximal runs → strongly positive z (the one
    // median-equal observation is discarded, merging at most one run)
    val alt = (0 until 40).map(i =>
      (i.toLong, (i % 2).toDouble * 10.0 + i.toDouble * 0.01))
    val rAlt = TimeOps.runsTest(series(alt), "value", "ts_us", Seq("user_id")).collect()(0)
    assert(rAlt.getAs[Long]("runs") >= 38L)
    assert(rAlt.getAs[Double]("z") > 5.0)
    // constant series: every value IS the median → discarded → no row
    val const = (0 until 10).map(i => (i.toLong, 3.0))
    assert(TimeOps.runsTest(series(const), "value", "ts_us", Seq("user_id")).count() == 0)
    // n1 = n2 = 1 (σ = 0): row survives with a NULL z, not NaN
    val two = Seq((0L, 1.0), (1L, 2.0), (2L, 0.5))
    val rTwo = TimeOps.runsTest(series(two), "value", "ts_us", Seq("user_id")).collect()
    assert(rTwo.length == 1 && rTwo(0).isNullAt(rTwo(0).fieldIndex("z")))
  }

  test("cox-stuart matches a direct half-pairing scan and reads trends") {
    def refCS(pts: Seq[(Long, Double)]): (Long, Long) = {
      val byT = pts.sortBy(_._1).map(_._2)
      val n = byT.size
      val half = n / 2
      val off = n - half
      var up = 0L; var dn = 0L
      for (i <- 0 until half) {
        if (byT(i + off) > byT(i)) up += 1
        else if (byT(i + off) < byT(i)) dn += 1
      }
      (up, dn)
    }
    for (seed <- Seq(3, 5, 9); n <- Seq(1, 2, 3, 17, 60)) {
      val pts = mkSeries(n, seed)
      val rows = TimeOps.coxStuart(series(pts), "value", "ts_us", Seq("user_id")).collect()
      val (up, dn) = refCS(pts)
      assert(rows.length == 1, s"n=$n seed=$seed: the row survives even tie-degenerate")
      assert(rows(0).getAs[Long]("s_plus") == up, s"n=$n seed=$seed")
      assert(rows(0).getAs[Long]("s_minus") == dn, s"n=$n seed=$seed")
    }
    // strictly increasing: every pair up — z = √half exactly
    val up = (0 until 41).map(i => (i.toLong, i.toDouble))
    val rUp = TimeOps.coxStuart(series(up), "value", "ts_us", Seq("user_id")).collect()(0)
    assert(rUp.getAs[Long]("s_plus") == 20L && rUp.getAs[Long]("s_minus") == 0L,
      "odd n drops the middle observation")
    assert(rUp.getAs[Double]("z") == math.sqrt(20.0))
    // constant: all pairs tie — row survives with NULL z
    val const = (0 until 10).map(i => (i.toLong, 4.0))
    val rC = TimeOps.coxStuart(series(const), "value", "ts_us", Seq("user_id")).collect()
    assert(rC.length == 1 && rC(0).isNullAt(rC(0).fieldIndex("z")))
    // a pure weekly CYCLE fools neither: phase-aligned halves tie-ish
    // (period divides the offset when n = 4 weeks → offset 14)
    val cyc = (0 until 28).map(i => (i.toLong, (i % 7).toDouble))
    val rCy = TimeOps.coxStuart(series(cyc), "value", "ts_us", Seq("user_id")).collect()
    assert(rCy.length == 1 && rCy(0).isNullAt(rCy(0).fieldIndex("z")),
      "period-aligned pairing: a clean cycle contributes zero signal")
  }

  test("seasonal theil-sen: within-phase brute force, cycle immunity, trend recovery") {
    val day = 86400000000L
    def phase(t: Long): Int = ((t / day + 3) % 7).toInt
    def run(pts: Seq[(Long, Double)]) = {
      val phc = org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.expr("ts_us div 86400000000")
          .plus(org.apache.spark.sql.functions.lit(3)),
        org.apache.spark.sql.functions.lit(7)).cast("int")
      TimeOps.theilSenSeasonal(series(pts), "value", "ts_us", Seq("user_id"), phc).collect()
    }
    def ref(pts: Seq[(Long, Double)]): Option[(Long, Double)] = {
      val slopes = for {
        a <- pts; b <- pts
        if a._1 < b._1 && phase(a._1) == phase(b._1)
      } yield (b._2 - a._2) / ((b._1 - a._1).toDouble)
      if (slopes.isEmpty) None
      else Some((slopes.size.toLong, slopes.sorted.apply((slopes.size + 1) / 2 - 1)))
    }
    // daily data, 8 weeks, bursty counts — brute-force parity
    val pts = (0 until 56).map(i =>
      (i.toLong * day, ((i * 5 + 3) % 7).toDouble + (if (i % 11 == 0) 20.0 else 0.0)))
    val got = run(pts)
    val Some((np, slope)) = ref(pts): @unchecked
    assert(got(0).getAs[Long]("n_pairs") == np)
    assert(got(0).getAs[Double]("sen_slope") == slope, "bit-equal to the pair-join median")
    // pure weekly cycle + linear trend: every within-phase pair spans
    // whole weeks of the cycle, so its slope IS the trend, exactly
    val trend = 0.5 / day
    val cyc = (0 until 56).map(i =>
      (i.toLong * day, ((i % 7) * 10).toDouble + trend * (i.toLong * day).toDouble))
    val gotCyc = run(cyc)
    assert(math.abs(gotCyc(0).getAs[Double]("sen_slope") - trend) < 1e-18,
      "the cycle is structurally removed — the median slope IS the trend")
    // one observation per phase: no within-season pair — series drops
    val sparse = (0 until 7).map(i => (i.toLong * day, i.toDouble))
    assert(run(sparse).isEmpty)
  }

  test("ljung-box: persistence reads large, scramble reads small, shift-invariant at 1e12") {
    def q(pts: Seq[(Long, Double)]): Double = {
      val d = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      val frame = spark.createDataFrame(spark.sparkContext.parallelize(d, 3), schema2)
      TimeOps.ljungBox(frame, "value", Seq("user_id"), Seq("ts_us", "event_id"), maxLag = 10)
        .collect()(0).getAs[Double]("q_lb")
    }
    // slow sine: heavy short-lag autocorrelation → enormous Q
    val smooth = (0 until 120).map(i => (i.toLong * 60L, math.sin(i * 0.12) * 10))
    assert(q(smooth) > 200.0, s"persistent series must fail whiteness: ${q(smooth)}")
    // the same values shuffled in time (seeded — deterministic):
    // near-white → small Q. (A multiplicative-hash sort is NOT a
    // scramble: sorting a Weyl sequence yields constant-stride
    // three-distance order that PRESERVES autocorrelation.)
    val scrambled = new scala.util.Random(42)
      .shuffle(smooth.map(_._2).toList)
      .zipWithIndex.map { case (v, j) => (j.toLong * 60L, v) }
    assert(q(scrambled) < 30.0, s"scrambled series must look white-ish: ${q(scrambled)}")
    // 1e12 offset: the first-value shift removes the offset BEFORE any
    // sum — no cancellation garbage (the raw-sums form returns ±1e10
    // noise here). Not bit-equal (v + 1e12 already rounds v to the
    // 2.4e-4 ulp), but within a few rounded-r boundary flips of Q.
    val huge = smooth.map { case (t, v) => (t, v + 1.0e12) }
    assert(math.abs(q(huge) - q(smooth)) < 5.0,
      s"offset must not corrupt Q: ${q(huge)} vs ${q(smooth)}")
    // constant: every lag degenerate → all terms coalesce to 0
    val const = (0 until 30).map(i => (i.toLong * 60L, 5.0))
    assert(q(const) == 0.0)
  }

  test("adf: Cramer solve matches an independent Gaussian elimination; verdicts separate") {
    def runAdf(pts: Seq[(Long, Double)]) = {
      val rows = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      val frame = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema2)
      TimeOps.adfTest(frame, "value", Seq("user_id"), Seq("ts_us", "event_id")).collect()
    }
    // independent reference: build the regression rows, solve the 3×3
    // normal equations by Gaussian elimination with partial pivoting
    // (a DIFFERENT algorithm than the production Cramer text)
    def refAdf(pts: Seq[(Long, Double)]): Option[(Double, Double)] = {
      val x = pts.sortBy(_._1).map(_._2)
      val x0 = x.head
      val d = x.map(_ - x0)
      val rows = (2 until d.size).map(t => (1.0, d(t - 1), d(t - 1) - d(t - 2), d(t) - d(t - 1)))
      val m = rows.size
      if (m < 4) return None
      val a = Array.ofDim[Double](3, 4)
      for ((c1, c2, c3, y) <- rows) {
        val v = Array(c1, c2, c3)
        for (i <- 0 until 3; j <- 0 until 3) a(i)(j) += v(i) * v(j)
        for (i <- 0 until 3) a(i)(3) += v(i) * y
      }
      val mat = a.map(_.clone())
      for (p <- 0 until 3) {
        val piv = (p until 3).maxBy(r => math.abs(mat(r)(p)))
        if (math.abs(mat(piv)(p)) < 1e-300) return None
        val tmp = mat(p); mat(p) = mat(piv); mat(piv) = tmp
        for (r <- p + 1 until 3) {
          val f = mat(r)(p) / mat(p)(p)
          for (c2 <- p to 3) mat(r)(c2) -= f * mat(p)(c2)
        }
      }
      val coef = new Array[Double](3)
      for (p <- 2 to 0 by -1) {
        var s = mat(p)(3)
        for (c2 <- p + 1 until 3) s -= mat(p)(c2) * coef(c2)
        coef(p) = s / mat(p)(p)
      }
      val rss = rows.map { case (c1, c2, c3, y) =>
        val e = y - coef(0) * c1 - coef(1) * c2 - coef(2) * c3; e * e
      }.sum
      if (rss <= 0) return None
      // (A⁻¹)₂₂ via the cofactor over the ORIGINAL normal matrix
      val det = a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
      val c22 = a(0)(0) * a(2)(2) - a(0)(2) * a(2)(0)
      if (det <= 0 || c22 <= 0) return None
      val se = math.sqrt(rss / (m - 3.0) * (c22 / det))
      Some((coef(1), coef(1) / se))
    }
    for (seed <- Seq(3, 9); n <- Seq(30, 80)) {
      // bursty but mean-reverting count-ish series
      val pts = mkSeries(n, seed)
      val got = runAdf(pts)(0)
      val Some((beta, t)) = refAdf(pts): @unchecked
      assert(math.abs(got.getAs[Double]("beta") - beta) < 1e-3,
        s"n=$n seed=$seed: ${got.getAs[Double]("beta")} vs $beta")
      assert(math.abs(got.getAs[Double]("t_stat") - t) < 1e-3,
        s"n=$n seed=$seed: ${got.getAs[Double]("t_stat")} vs $t")
    }
    // seeded white noise: strongly stationary — t far negative.
    // (A hash/Weyl sequence is NOT noise: modular rotations are
    // structured, and a zero-mean modular STEP walk is a bounded
    // periodic oscillation — i.e. stationary, the opposite fixture.)
    val rng = new scala.util.Random(7)
    val noise = (0 until 200).map(i => (i.toLong, rng.nextGaussian() * 10))
    assert(runAdf(noise)(0).getAs[Double]("t_stat") < -5.0)
    // seeded random walk: unit root — t must not reject
    val rng2 = new scala.util.Random(11)
    var acc = 0.0
    val walk = (0 until 200).map { i => acc += rng2.nextGaussian(); (i.toLong, acc) }
    val tWalk = runAdf(walk)(0).getAs[Double]("t_stat")
    assert(tWalk > -2.86, s"a random walk must not reject the unit root: $tWalk")
    // constant series: degenerate design — NULL verdict, row present
    val const = (0 until 30).map(i => (i.toLong, 7.0))
    val rc = runAdf(const)(0)
    assert(rc.isNullAt(rc.fieldIndex("t_stat")) && rc.isNullAt(rc.fieldIndex("beta")))
    // 1e12 offset: the shift makes the regression offset-stable
    val base = mkSeries(60, 5)
    val off = base.map { case (t, v) => (t, v + 1.0e12) }
    val tB = runAdf(base)(0).getAs[Double]("t_stat")
    val tO = runAdf(off)(0).getAs[Double]("t_stat")
    assert(math.abs(tB - tO) < 1e-2, s"offset stability: $tB vs $tO")
  }

  test("kpss: verdicts complement adf; brute-force partial-sum check; offset-stable") {
    def runKpss(pts: Seq[(Long, Double)]) = {
      val rows = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      val frame = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema2)
      TimeOps.kpss(frame, "value", Seq("user_id"), Seq("ts_us", "event_id")).collect()
    }
    def refEta(pts: Seq[(Long, Double)]): Option[Double] = {
      val x = pts.sortBy(_._1).map(_._2)
      val mean = x.sum / x.size
      val e = x.map(_ - mean)
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      val se2 = e.map(v => v * v).sum
      if (se2 <= 0) None else Some(s.map(v => v * v).sum / (x.size * se2))
    }
    // brute-force parity (round-4 tolerance: the spec path and the
    // production path demean with differently-ordered sums)
    for (seed <- Seq(3, 9); n <- Seq(17, 80)) {
      val pts = mkSeries(n, seed)
      val got = runKpss(pts)(0).getAs[Double]("eta")
      val Some(want) = refEta(pts): @unchecked
      assert(math.abs(got - want) < 1e-3, s"n=$n seed=$seed: $got vs $want")
    }
    // seeded white noise: level-stationary — small η (5% bar 0.463)
    val rng = new scala.util.Random(7)
    val noise = (0 until 200).map(i => (i.toLong, rng.nextGaussian() * 10))
    assert(runKpss(noise)(0).getAs[Double]("eta") < 0.463)
    // seeded random walk: unit root — η far above the bar
    val rng2 = new scala.util.Random(11)
    var acc = 0.0
    val walk = (0 until 200).map { i => acc += rng2.nextGaussian(); (i.toLong, acc) }
    assert(runKpss(walk)(0).getAs[Double]("eta") > 1.0)
    // constant: zero residual energy — NULL η, row present
    val const = (0 until 30).map(i => (i.toLong, 7.0))
    val rc = runKpss(const)(0)
    assert(rc.isNullAt(rc.fieldIndex("eta")))
    // 1e12 offset: the shift keeps demeaning at small-number precision
    val base = mkSeries(60, 5)
    val off = base.map { case (t, v) => (t, v + 1.0e12) }
    assert(math.abs(runKpss(base)(0).getAs[Double]("eta") -
      runKpss(off)(0).getAs[Double]("eta")) < 1e-3)
  }

  test("kpss HAC: statsmodels-style brute force; bandwidth integers; knob=0 ≡ lag-0") {
    def mkFrame(pts: Seq[(Long, Double)]) = {
      val rows = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema2)
    }
    def runHac(pts: Seq[(Long, Double)], bw: Int = 16) =
      TimeOps.kpssHac(mkFrame(pts), "value", Seq("user_id"), Seq("ts_us", "event_id"), bw)
        .collect()
    // statsmodels reference: q = floor(4*(n/100)^0.25), Bartlett lrv
    def refHac(pts: Seq[(Long, Double)]): (Int, Option[Double]) = {
      val x = pts.sortBy(_._1).map(_._2)
      val n = x.size
      val mean = x.sum / n
      val e = x.map(_ - mean)
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      val q = math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt
      val cov = (1 to q).map(j => (j until n).map(t => e(t) * e(t - j)).sum)
      val lrv = e.map(v => v * v).sum +
        2.0 * (1 to q).map(j => (1.0 - j.toDouble / (q + 1)) * cov(j - 1)).sum
      (q, if (lrv <= 0) None else Some(s.map(v => v * v).sum / (n * lrv)))
    }
    for (seed <- Seq(3, 9); n <- Seq(17, 80, 150)) {
      val pts = mkSeries(n, seed)
      val row = runHac(pts)(0)
      val (qWant, Some(etaWant)) = refHac(pts): @unchecked
      assert(row.getAs[Int]("bandwidth") == qWant, s"n=$n: bandwidth")
      assert(math.abs(row.getAs[Double]("eta") - etaWant) < 1e-3,
        s"n=$n seed=$seed: ${row.getAs[Double]("eta")} vs $etaWant")
    }
    // the pure-integer bandwidth count == the libm floor formula, n up to the 16-cap
    for (n <- Seq(1, 5, 99, 100, 101, 274, 1000, 1599, 1600, 1601, 10000, 32600)) {
      val direct = math.min(16, math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt)
      val counted = (1 to 16).count(k => 64L * n >= 25L * k * k * k * k)
      assert(counted == direct, s"n=$n: integer bandwidth $counted != floor formula $direct")
    }
    // knob = 0 degenerates to the lag-0 kpss statistic exactly
    val pts = mkSeries(80, 5)
    val lag0 = runHac(pts, bw = 0)(0)
    val plain = TimeOps.kpss(mkFrame(pts), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .collect()(0)
    assert(lag0.getAs[Int]("bandwidth") == 0)
    assert(lag0.getAs[Double]("eta") == plain.getAs[Double]("eta"),
      "maxBandwidth=0 must reproduce lag-0 KPSS bit-for-bit")
    // autocorrelated series: the HAC denominator grows, η shrinks vs lag-0
    val rng = new scala.util.Random(13)
    var ar = 0.0
    val arSeries = (0 until 300).map { i =>
      ar = 0.8 * ar + rng.nextGaussian(); (i.toLong, ar)
    }
    val hacEta = runHac(arSeries)(0).getAs[Double]("eta")
    val lag0Eta = TimeOps.kpss(mkFrame(arSeries), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .collect()(0).getAs[Double]("eta")
    assert(hacEta < lag0Eta, s"HAC must deflate η on AR(1) noise: $hacEta vs $lag0Eta")
  }

  test("kpss trend ('ct'): statsmodels brute force; ramp reads trend-stationary; knob=0") {
    def mkFrame(pts: Seq[(Long, Double)]) = {
      val rows = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema2)
    }
    def runTrend(pts: Seq[(Long, Double)], bw: Int = 16) =
      TimeOps.kpssTrend(mkFrame(pts), "value", Seq("user_id"), Seq("ts_us", "event_id"), bw)
        .collect()
    // statsmodels reference: OLS residuals on [1, t], Bartlett lrv
    def refTrend(pts: Seq[(Long, Double)]): (Int, Option[Double]) = {
      val x = pts.sortBy(_._1).map(_._2)
      val n = x.size
      val t = (0 until n).map(_.toDouble)
      val (st, stt, sd, std2) = (t.sum, t.map(v => v * v).sum, x.sum, t.zip(x).map { case (a, b) => a * b }.sum)
      val b = (n * std2 - st * sd) / (n * stt - st * st)
      val a = (sd - b * st) / n
      val e = t.zip(x).map { case (ti, xi) => xi - (a + b * ti) }
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      val q = math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt
      val cov = (1 to q).map(j => (j until n).map(k => e(k) * e(k - j)).sum)
      val lrv = e.map(v => v * v).sum +
        2.0 * (1 to q).map(j => (1.0 - j.toDouble / (q + 1)) * cov(j - 1)).sum
      (q, if (lrv <= 0) None else Some(s.map(v => v * v).sum / (n * lrv)))
    }
    for (seed <- Seq(3, 9); n <- Seq(17, 80, 150)) {
      val pts = mkSeries(n, seed)
      val row = runTrend(pts)(0)
      val (qWant, Some(etaWant)) = refTrend(pts): @unchecked
      assert(row.getAs[Int]("bandwidth") == qWant)
      assert(math.abs(row.getAs[Double]("eta") - etaWant) < 1e-3,
        s"n=$n seed=$seed: ${row.getAs[Double]("eta")} vs $etaWant")
    }
    // a noisy RAMP: the LEVEL test rejects, the TREND test accepts —
    // exactly the discrimination 'ct' exists for
    val rng = new scala.util.Random(7)
    val ramp = (0 until 300).map(i => (i.toLong, 0.5 * i + rng.nextGaussian()))
    val trendEta = runTrend(ramp)(0).getAs[Double]("eta")
    val levelEta = TimeOps.kpssHac(mkFrame(ramp), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .collect()(0).getAs[Double]("eta")
    assert(trendEta < 0.146, s"ramp must read trend-stationary (5% bar 0.146): $trendEta")
    assert(levelEta > 0.463, s"ramp must fail the LEVEL test: $levelEta")
    // pure linear series: residuals are ~0, zero residual energy → null
    val pure = (0 until 40).map(i => (i.toLong, 3.0 * i + 7.0))
    val rc = runTrend(pure)(0)
    assert(rc.isNullAt(rc.fieldIndex("eta")), "an exact line has zero residual energy")
  }

  test("perm entropy: closed forms, brute-force counts, offset is a non-event") {
    def run(pts: Seq[(Long, Double)]) = {
      val rows = pts.zipWithIndex.map { case ((t, v), i) =>
        Row(1L, java.lang.Long.valueOf(t), java.lang.Long.valueOf(i.toLong), java.lang.Double.valueOf(v))
      }
      val schema2 = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("ts_us", LongType, nullable = true),
        StructField("event_id", LongType, nullable = false),
        StructField("value", DoubleType, nullable = true)))
      val frame = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema2)
      TimeOps.permEntropy(frame, "value", Seq("user_id"), Seq("ts_us", "event_id")).collect()
    }
    // monotone: one pattern only — H = 0
    val mono = (0 until 40).map(i => (i.toLong, i.toDouble))
    val rM = run(mono)(0)
    assert(rM.getAs[Double]("perm_entropy") == 0.0)
    assert(rM.getAs[Long]("c0") == 38L, "ascending triples land in the 012 pattern")
    // constant: stable tie rule also reads as ascending — H = 0
    val const = (0 until 20).map(i => (i.toLong, 3.0))
    assert(run(const)(0).getAs[Double]("perm_entropy") == 0.0)
    // seeded noise: near-uniform pattern use — H close to 1
    val rng = new scala.util.Random(7)
    val noise = (0 until 600).map(i => (i.toLong, rng.nextGaussian()))
    val hN = run(noise)(0).getAs[Double]("perm_entropy")
    assert(hN > 0.95 && hN <= 1.0, s"white noise must use all patterns: $hN")
    // brute-force count parity on a tied bursty series
    val pts = mkSeries(60, 5)
    def rank3(a: Double, b: Double, c: Double): Int =
      ((if (b < a) 1 else 0) + (if (c < a) 1 else 0)) * 9 +
        ((if (a <= b) 1 else 0) + (if (c < b) 1 else 0)) * 3 +
        ((if (a <= c) 1 else 0) + (if (b <= c) 1 else 0))
    val byT = pts.sortBy(_._1).map(_._2)
    val want = byT.sliding(3).map { case Seq(a, b, c) => rank3(a, b, c) }.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run(pts)(0)
    Seq(5, 7, 11, 15, 19, 21).zipWithIndex.foreach { case (pid, k) =>
      assert(got.getAs[Long](s"c$k") == want.getOrElse(pid, 0L), s"pattern $pid")
    }
    // ordinal statistics ignore level entirely: 1e12 offset bit-equal
    val off = pts.map { case (t, v) => (t, v + 1.0e12) }
    assert(run(off)(0).getAs[Double]("perm_entropy") ==
      got.getAs[Double]("perm_entropy"))
  }

  test("null values and null timestamps are excluded as complete cases") {
    val rows = Seq(
      Row(1L, java.lang.Long.valueOf(0L), java.lang.Double.valueOf(1.0)),
      Row(1L, java.lang.Long.valueOf(1L), null),
      Row(1L, null, java.lang.Double.valueOf(9.0)),
      Row(1L, java.lang.Long.valueOf(2L), java.lang.Double.valueOf(2.0)),
      Row(1L, java.lang.Long.valueOf(3L), java.lang.Double.valueOf(3.0)))
    val d = df(rows)
    val sp = TimeOps.spearman(d, "value", "ts_us", Seq("user_id")).collect()(0)
    assert(sp.getAs[Long]("n_obs") == 3L, "null-v and null-ts rows must not count")
    assert(sp.getAs[Double]("rho") == 1.0)
    val pt = TimeOps.pettitt(d, "value", "ts_us", Seq("user_id")).collect()(0)
    assert(pt.getAs[Long]("n_obs") == 3L)
  }

  test("NaN values sort last and tie with each other (DuckDB ORDER BY parity)") {
    val pts = Seq((0L, 1.0), (1L, Double.NaN), (2L, 2.0), (3L, Double.NaN), (4L, 0.5))
    val sp = TimeOps.spearman(series(pts), "value", "ts_us", Seq("user_id")).collect()(0)
    // ranks: 0.5→1, 1.0→2, 2.0→3, NaN,NaN→avg(4,5)=4.5 ⇒ t12v = 2³−2 = 6
    assert(sp.getAs[Long]("t12v") == 6L)
    assert(!sp.getAs[Double]("rho").isNaN)
  }
}
