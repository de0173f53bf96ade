package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TimeOps.kalman — the scalar local-level Kalman filter:
  * recursion exactness vs a straight reference loop, per-key resets,
  * the missing-value time update, and gain adaptation (the property
  * that separates it from fixed-α EWMA).
  */
class KalmanSpec extends SparkSpec {
  import spark.implicits._

  private val Q = 25.0
  private val R = 100.0

  private def referenceKalman(zs: Seq[Option[Double]]): Seq[Option[Double]] = {
    var init = false
    var x = 0.0
    var p = 0.0
    zs.map {
      case None =>
        if (init) { p += Q; Some(x) } else None
      case Some(z) =>
        if (!init) { init = true; x = z; p = R }
        else {
          val pp = p + Q
          val k = pp / (pp + R)
          x = x + k * (z - x)
          p = (1.0 - k) * pp
        }
        Some(x)
    }
  }

  private def run(rows: Seq[(String, Long, Option[Double])]): Map[(String, Long), Option[Double]] =
    TimeOps.kalman(rows.toDF("k", "t", "value"), "value", Seq("k"), Seq("t"), Q, R)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  test("recursion is bit-identical to the reference loop") {
    val zs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 90.0, 88.0, 91.0).map(Some(_))
    val exp = referenceKalman(zs)
    val out = run(zs.zipWithIndex.map { case (z, i) => ("a", i.toLong, z) })
    zs.indices.foreach { i =>
      assert(out(("a", i.toLong)) == exp(i), s"t=$i: ${out(("a", i.toLong))} != ${exp(i)}")
    }
  }

  test("state resets per key") {
    val rows = Seq(("a", 0L, Some(10.0)), ("a", 1L, Some(20.0)),
      ("b", 0L, Some(50.0)), ("b", 1L, Some(60.0)))
    val out = run(rows)
    assert(out(("b", 0L)) == Some(50.0), "first observation of a new key is the diffuse init")
    assert(out(("a", 1L)) != out(("b", 1L)))
  }

  test("missing values run the time update: uncertainty grows, next gain is higher") {
    // same observations, but one series has a 3-step gap before the
    // final z — its P has grown, so it moves FURTHER toward that z
    val base = Seq(Some(10.0), Some(10.0), Some(10.0))
    val gap = base ++ Seq(None, None, None) ++ Seq(Some(30.0))
    val noGap = base ++ Seq(Some(30.0))
    val outGap = referenceKalman(gap).last.get
    val outNoGap = referenceKalman(noGap).last.get
    assert(outGap > outNoGap,
      s"after a gap the filter must trust the new observation more: $outGap <= $outNoGap")
    // and the scan agrees with the reference on the gapped series
    val rows = gap.zipWithIndex.map { case (z, i) => ("g", i.toLong, z) }
    val out = run(rows)
    assert(out(("g", gap.length - 1L)) == Some(outGap))
    // null before any observation stays null
    val lead = run(Seq(("n", 0L, None), ("n", 1L, Some(5.0))))
    assert(lead(("n", 0L)).isEmpty && lead(("n", 1L)) == Some(5.0))
  }

  private def referenceRts(zs: Seq[Double]): Seq[Double] = {
    var x = 0.0; var p = 0.0; var init = false
    val xf = Array.ofDim[Double](zs.length)
    val pf = Array.ofDim[Double](zs.length)
    zs.zipWithIndex.foreach { case (z, i) =>
      if (!init) { init = true; x = z; p = R }
      else { val pp = p + Q; val k = pp / (pp + R); x = x + k * (z - x); p = (1.0 - k) * pp }
      xf(i) = x; pf(i) = p
    }
    val xs = Array.ofDim[Double](zs.length)
    xs(zs.length - 1) = xf(zs.length - 1)
    ((zs.length - 2) to 0 by -1).foreach { t =>
      xs(t) = xf(t) + (pf(t) / (pf(t) + Q)) * (xs(t + 1) - xf(t))
    }
    xs.toSeq
  }

  test("RTS smoother is bit-identical to the reference two-pass loop") {
    val zs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 9.0, 40.0, 38.0)
    val rows = zs.zipWithIndex.map { case (z, i) => ("a", i.toLong, Some(z)) }
    val out = TimeOps.kalmanSmooth(rows.toDF("k", "t", "value"), "value", Seq("k"), Seq("t"), Q, R)
      .orderBy("t").collect().map(r => (r.getDouble(3), r.getDouble(4)))
    val exp = referenceRts(zs)
    zs.indices.foreach { i =>
      assert(out(i)._2 == exp(i), s"t=$i: ${out(i)._2} != ${exp(i)}")
    }
    // the smoothed series ends where the filter ends
    assert(out.last._1 == out.last._2)
  }

  test("smoothing uses the future: an end-of-series jump pulls earlier estimates up") {
    val zs = Seq.fill(6)(10.0) ++ Seq(50.0, 50.0)
    val rows = zs.zipWithIndex.map { case (z, i) => ("a", i.toLong, Some(z)) }
    val out = TimeOps.kalmanSmooth(rows.toDF("k", "t", "value"), "value", Seq("k"), Seq("t"), Q, R)
      .orderBy("t").collect().map(r => (r.getDouble(3), r.getDouble(4)))
    // at t=4 (before the jump) the filter knows nothing of it; the
    // smoother does
    assert(out(4)._2 > out(4)._1 + 1.0,
      s"smoother must anticipate the jump: filtered ${out(4)._1}, smoothed ${out(4)._2}")
  }

  test("gain decays from 1 toward the steady-state Riccati gain") {
    // constant series: x̂ stays put, but P converges; verify via the
    // filter's response to a unit step at increasing depths
    val steady = { // steady-state gain for q=25, r=100
      val pStar = (Q + math.sqrt(Q * Q + 4 * Q * R)) / 2.0
      pStar / (pStar + R)
    }
    // response at t: x̂_t - x̂_{t-1} for a step of +1 at t equals K_t
    def gainAt(n: Int): Double = {
      val zs = Seq.fill(n)(Some(0.0)) :+ Some(1.0)
      referenceKalman(zs).last.get // x̂ was 0, step +1 → x̂ = K
    }
    assert(gainAt(1) > gainAt(5) && gainAt(5) >= gainAt(20), "gain must decay")
    assert(math.abs(gainAt(40) - steady) < 1e-9,
      s"deep gain ${gainAt(40)} must converge to the Riccati gain $steady")
  }
}
