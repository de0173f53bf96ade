package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins windowedTaylorCoefs to the reference for the cases the
  * hash-parity gate cannot see (the oracle SQL is generated from the
  * same branch tables): groups SHORTER than the window, and edge fill
  * under ew_span.
  *
  * Goldens were produced by running the reference itself
  * (taylor_coefs_one_column_grp, featurize.py:300) on
  * v_i = 1 + 0.3·i + 0.01·i², full double precision. Key facts they
  * encode (all empirically verified):
  *  - n < w centered: a row that is both a left and a right edge
  *    (pos < h && rpos < h) is NaN — numpy lstsq over a y-slice with
  *    missing data returns all-NaN;
  *  - the "never-filled" centered position rpos == h IS filled by the
  *    left-edge fit when pos < h (short groups);
  *  - with ew_span, the reference's W½·y matmul NaN-contaminates every
  *    incomplete-window column (0·NaN), so filled edges are NULL except
  *    structurally-zero pinv rows, which come out exactly 0.0 (e.g.
  *    trailing pos=1 → [NaN, 0.0, 0.0]); only trailing pos = w-1 (full
  *    window complete) gets a real ew edge fit.
  */
class TaylorShortGroupSpec extends SparkSpec {
  import spark.implicits._

  private def v(i: Int): Double = 1.0 + 0.3 * i + 0.01 * i * i

  private def run(ns: Seq[Int], degree: Int, w: Int, align: String, ew: Option[Int], fill: Boolean) = {
    val df = ns.zipWithIndex
      .flatMap { case (n, g) => (0 until n).map(i => (g, i, v(i))) }
      .toDF("g", "t", "v")
    val res = Taylor.windowedTaylorCoefs(df, Seq("v"), Seq("g"), Seq("t"), degree, Seq(w), Seq(align), Seq(ew), fill)
    val rows = res.df.orderBy("g", "t").select((col("g") +: res.featureNames.map(col)): _*).collect()
    ns.indices.map { g =>
      val grp = rows.filter(_.getInt(0) == g)
      res.featureNames.indices.map(d =>
        grp.map(r => if (r.isNullAt(d + 1)) None else Some(r.getDouble(d + 1))).toSeq)
    }
  }

  private val N = None
  private def S(d: Double) = Some(d)

  test("centered fill_edges: groups shorter than the window match the reference") {
    val Seq(g2, g3, g4, g5, g6) = run(Seq(2, 3, 4, 5, 6), 1, 5, "centered", None, fill = true)
    // n=2: every row is an overlap edge -> all null
    assertApprox(g2(0), Seq(N, N), 1e-9, "n2.c0")
    assertApprox(g2(1), Seq(N, N), 1e-9, "n2.c1")
    // n=3: rpos==h row IS left-edge filled; middle row overlap -> null
    assertApprox(g3(0), Seq(S(0.9966666666666661), N, S(1.6366666666666667)), 1e-9, "n3.c0")
    assertApprox(g3(1), Seq(S(0.32000000000000023), N, S(0.32000000000000023)), 1e-9, "n3.c1")
    // n=4: no overlap, no never-filled cell — everything edge-filled
    assertApprox(g4(0), Seq(S(0.9966666666666661), S(1.32), S(1.65), S(1.9866666666666668)), 1e-9, "n4.c0")
    assertApprox(g4(1), Seq(S(0.32000000000000023), S(0.3300000000000002), S(0.33000000000000007), S(0.33999999999999975)), 1e-9, "n4.c1")
    // n=5 (= w): classic never-filled at rpos==h (pos>=h)
    assertApprox(g5(0), Seq(S(0.9966666666666661), S(1.32), N, S(2.0), S(2.356666666666667)), 1e-9, "n5.c0")
    assertApprox(g5(1), Seq(S(0.32000000000000023), S(0.3300000000000002), N, S(0.3500000000000002), S(0.3600000000000001)), 1e-9, "n5.c1")
    // n=6: one interior row appears
    assertApprox(g6(0), Seq(S(0.9966666666666661), S(1.32), S(1.66), N, S(2.3699999999999997), S(2.746666666666667)), 1e-9, "n6.c0")
    assertApprox(g6(1), Seq(S(0.32000000000000023), S(0.3300000000000002), S(0.34000000000000025), N, S(0.37000000000000016), S(0.37999999999999995)), 1e-9, "n6.c1")
  }

  test("trailing ew_span fill_edges matches the reference NaN-contamination pattern") {
    val Seq(g) = run(Seq(20), 1, 5, "trailing", Some(7), fill = true)
    val e0 = Seq(S(0.0), N, N, N, S(2.3534362680899137), S(2.7377917768613402), S(3.1477917768613404),
      S(3.5777917768613405), S(4.027791776861341), S(4.497791776861339), S(4.987791776861339),
      S(5.497791776861341), S(6.02779177686134), S(6.577791776861341), S(7.147791776861341),
      S(7.737791776861343), S(8.347791776861339), S(8.977791776861341), S(9.62779177686134),
      S(10.29779177686134))
    val e1 = Seq(S(0.0), S(0.0), N, N, S(0.35265106630768217), S(0.3646486758547342), S(0.3846486758547343),
      S(0.40464867585473435), S(0.42464867585473426), S(0.4446486758547335), S(0.46464867585473457),
      S(0.484648675854734), S(0.504648675854734), S(0.5246486758547338), S(0.5446486758547342),
      S(0.5646486758547337), S(0.5846486758547337), S(0.6046486758547335), S(0.6246486758547338),
      S(0.6446486758547333))
    assertApprox(g(0), e0, 1e-9, "ew.c0")
    assertApprox(g(1), e1, 1e-9, "ew.c1")
  }

  test("centered ew_span fill_edges: all edges null (every edge window incomplete)") {
    val Seq(g) = run(Seq(20), 1, 5, "centered", Some(7), fill = true)
    val interior0 = Seq(1.6560423219902771, 2.0060423219902774, 2.3760423219902767, 2.7660423219902768,
      3.1760423219902765, 3.606042321990277, 4.056042321990277, 4.526042321990276, 5.016042321990276,
      5.526042321990276, 6.056042321990277, 6.6060423219902775, 7.176042321990277, 7.766042321990276,
      8.376042321990274)
    val e0 = Seq(N, N) ++ interior0.map(S) ++ Seq(N, N, N)
    assertApprox(g(0), e0, 1e-9, "cew.c0")
    assert(g(1).take(2).forall(_.isEmpty) && g(1).takeRight(3).forall(_.isEmpty))
  }

  test("trailing ew_span degree 2: structural-zero pinv rows give exact 0.0, not NaN") {
    val Seq(g) = run(Seq(20), 2, 5, "trailing", Some(7), fill = true)
    // row 0: empty system -> zeros; row 1: [NaN, 0, 0]; rows 2-3 all NaN
    assert(g(0).take(4) == Seq(S(0.0), N, N, N), g(0).take(4))
    assert(g(1).take(4) == Seq(S(0.0), S(0.0), N, N), g(1).take(4))
    assert(g(2).take(4) == Seq(S(0.0), S(0.0), N, N), g(2).take(4))
    // first real edge fit at pos = w-1 (full window complete)
    assertApprox(Seq(g(0)(4), g(1)(4), g(2)(4)),
      Seq(S(2.359999999999999), S(0.37999999999999934), S(0.020000000000000018)), 1e-9, "row4")
  }

  test("trailing no-ew degree 2 short-ish group matches reference exactly") {
    val Seq(g) = run(Seq(6), 2, 5, "trailing", None, fill = true)
    assertApprox(g(0), Seq(S(0.0), S(1.31), S(1.6399999999999988), S(1.9900000000000004), S(2.359999999999999), S(2.75)), 1e-9, "c0")
    assertApprox(g(1), Seq(S(0.0), S(0.0), S(0.2639999999999998), S(0.35999999999999943), S(0.3800000000000003), S(0.40000000000000036)), 1e-9, "c1")
    assertApprox(g(2), Seq(S(0.0), S(0.0), S(-0.132), S(0.019999999999999407), S(0.020000000000000517), S(0.019999999999999796)), 1e-9, "c2")
  }
}
