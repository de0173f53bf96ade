package graft.ts

import graft.SparkSpec

/** Pins TimeOps.mannKendall — the nonparametric monotone-trend test. */
class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double)]) =
    TimeOps.mannKendall(rows.toDF("user_id", "ts_us", "value"),
        "value", "ts_us", Seq("user_id"))
      .orderBy("user_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("strictly increasing series: S = n_pairs, z matches the closed form") {
    val n = 6
    val out = run((0 until n).map(i => (1L, i.toLong, i.toDouble)))
    val (nObs, nPairs, s, z) = out(1L)
    assert(nObs == 6L && nPairs == 15L && s == 15L)
    val expectedZ = (15.0 - 1.0) / math.sqrt(6.0 * 5 * 17 / 18.0)
    assert(z == expectedZ, s"z $z != $expectedZ")
  }

  test("reversal and ties: signs cancel, tied pairs contribute zero, S=0 -> z=0") {
    // up then symmetrically down: every up pair has a mirror down pair
    val vals = Seq(0.0, 1.0, 2.0, 1.0, 0.0)
    val (_, _, s, _) = run(vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) })(1L)
    // pairs: (0,1)+ (0,2)+ (0,1')+ (0,0')0 (1,2)+ (1,1')0 (1,0')- (2,1')- (2,0')- (1',0')-
    // S = 4 up, 4 down, 2 ties = 0
    assert(s == 0L)
    assert(run(vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) })(1L)._4 == 0.0)
    // constant series: all ties
    val (_, np2, s2, z2) = run((0 until 5).map(i => (2L, i.toLong, 7.0)))(2L)
    assert(np2 == 10L && s2 == 0L && z2 == 0.0)
  }

  test("decreasing trend is antisymmetric to increasing") {
    val up = run((0 until 8).map(i => (1L, i.toLong, i.toDouble)))(1L)
    val down = run((0 until 8).map(i => (1L, i.toLong, -i.toDouble)))(1L)
    assert(up._3 == -down._3 && up._4 == -down._4)
  }

  test("tie-corrected variance: closed form on a hand-computed tied series") {
    // values 1, 2, 2, 3 on ts 0..3: signs + + + 0 + + -> S = 5;
    // one tie group t = 2 -> tie_adj = 2*1*9 = 18;
    // n(n-1)(2n+5) = 4*3*13 = 156; Var = (156-18)/18; z = 4/sqrt(...)
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 2.0), (1L, 3L, 3.0))
      .toDF("user_id", "ts_us", "value")
    val r = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"),
      tieCorrected = true).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 6L && r.getLong(3) == 5L,
      s"n/pairs/S: $r")
    assert(r.getLong(4) == 18L, s"tie_adj: $r")
    val expectedZ = (5.0 - 1.0) / math.sqrt((156.0 - 18.0) / 18.0)
    assert(r.getDouble(5) == expectedZ, s"z ${r.getDouble(5)} != $expectedZ")
  }

  test("tie correction only shrinks the variance: |z_ties| >= |z| on tied data") {
    val rows = (0 until 30).map(i => (1L, i.toLong, (i % 5).toDouble)) ++
      (0 until 25).map(i => (2L, i.toLong, i.toDouble + (i % 3))) // ties via repeated steps
    val df = rows.toDF("user_id", "ts_us", "value")
    val plain = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val ties = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"),
      tieCorrected = true).collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for ((u, zt) <- ties)
      assert(math.abs(zt) >= math.abs(plain(u)),
        s"user $u: tie-corrected |z| must not shrink: $zt vs ${plain(u)}")
    // constant-valued series: S = 0 and the S=0 branch fires BEFORE the
    // (zero) corrected variance could divide
    val const = (0 until 10).map(i => (9L, i.toLong, 7.5)).toDF("user_id", "ts_us", "value")
    val cz = TimeOps.mannKendall(const, "value", "ts_us", Seq("user_id"),
      tieCorrected = true).collect().head
    assert(cz.getLong(3) == 0L && cz.getDouble(5) == 0.0, cz.toString)
  }

  test("tie-corrected route parity: kernel == declarative join to the last bit") {
    val rnd = new scala.util.Random(4242L)
    val rows = for (u <- 0 until 40; i <- 0 until (3 + rnd.nextInt(25)))
      yield (u.toLong, i.toLong * 7L, rnd.nextInt(6).toDouble * 1.25)
    val df = rows.toDF("user_id", "ts_us", "value")
    val k = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"), tieCorrected = true)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val j = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"),
        autoMaxPairs = None, tieCorrected = true)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(k == j, s"routes diverged: ${k.toSeq.sortBy(_._1).take(2)} vs ${j.toSeq.sortBy(_._1).take(2)}")
  }

  test("seasonal Mann-Kendall: per-season S sums, cross-season pairs never form") {
    // 4 seasons x 6 points, each season strictly increasing in its own
    // range BUT ranges interleave so cross-season pairs would flip
    // signs if they (wrongly) formed: S must be exactly sum of
    // per-season pair counts
    val rows = for (p <- 0 until 4; i <- 0 until 6)
      yield (1L, (i * 4 + p).toLong, (p * 100 + i).toDouble)
    val df = rows.toDF("user_id", "ts_us", "value")
    val phase = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("ts_us"),
      org.apache.spark.sql.functions.lit(4L)).cast("int")
    val r = TimeOps.mannKendallSeasonal(df, "value", "ts_us", Seq("user_id"), phase)
      .collect().head
    // n_seasons=4, n_obs=24, per-season pairs 15 -> 60, all concordant
    assert(r.getLong(1) == 4L && r.getLong(2) == 24L && r.getLong(3) == 60L
      && r.getLong(4) == 60L, r.toString)
    val var18 = 4.0 * (6.0 * 5 * 17) / 18.0
    assert(r.getDouble(5) == (60.0 - 1.0) / math.sqrt(var18), r.toString)
    // sanity: the UNSEASONED test on the same frame sees the
    // interleaved ranges as a much weaker trend signal per pair count
    val plain = TimeOps.mannKendall(df, "value", "ts_us", Seq("user_id"))
      .collect().head
    assert(plain.getLong(2) == 276L, s"all cross pairs form in the plain test: $plain")
  }

  test("Kendall tau_b: closed form, tie adjustment, and the undefined-tau guard") {
    // values 1, 2, 2, 3: S = 5, n0 = 6, n1 = 1 (one tied pair),
    // n0 - n2 = n_pairs = 6 -> tau_b = 5 / sqrt(5 * 6)
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 2.0), (1L, 3L, 3.0))
      .toDF("user_id", "ts_us", "value")
    val r = TimeOps.kendallTau(df, "value", "ts_us", Seq("user_id")).collect().head
    assert(r.getLong(2) == 6L && r.getLong(3) == 5L && r.getLong(4) == 1L, r.toString)
    assert(r.getDouble(5) == 5.0 / math.sqrt(5.0 * 6.0), r.toString)
    // strictly increasing, no ties: tau_b = 1 exactly
    val mono = (0 until 12).map(i => (2L, i.toLong, i * 2.5))
      .toDF("user_id", "ts_us", "value")
    val m = TimeOps.kendallTau(mono, "value", "ts_us", Seq("user_id")).collect().head
    assert(m.getDouble(5) == 1.0, m.toString)
    // all values tied: n1 = n0, tau undefined -> null (S = 0 anyway)
    val const = (0 until 8).map(i => (3L, i.toLong, 4.25)).toDF("user_id", "ts_us", "value")
    val c = TimeOps.kendallTau(const, "value", "ts_us", Seq("user_id")).collect().head
    assert(c.getLong(3) == 0L && c.isNullAt(5), c.toString)
  }

  test("Kendall tau_b route parity: kernel == declarative join to the last bit") {
    val rnd = new scala.util.Random(777L)
    val rows = for (u <- 0 until 30; i <- 0 until (2 + rnd.nextInt(20)))
      yield (u.toLong, i.toLong * 3L, rnd.nextInt(5).toDouble * 0.75)
    val df = rows.toDF("user_id", "ts_us", "value")
    val k = TimeOps.kendallTau(df, "value", "ts_us", Seq("user_id"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val j = TimeOps.kendallTau(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(k == j, s"routes diverged")
  }
}
