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
}
