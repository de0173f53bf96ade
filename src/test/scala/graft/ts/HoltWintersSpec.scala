package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TimeOps.holtWinters — additive seasonal exponential smoothing
  * with the documented zero init.
  */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val A = 0.5; private val B = 0.3; private val G = 0.2; private val M = 4

  /** Reference single-node recursion (the documented contract). */
  private def ref(xs: Seq[Double]): Seq[(Double, Double, Double, Option[Double])] = {
    var l = xs.head; var b = 0.0; val s = Array.fill(M)(0.0); var t = 1L
    (l, 0.0, 0.0, None) +: xs.tail.map { x =>
      t += 1
      val idx = (t % M).toInt
      val si = s(idx)
      val fit = (l + b) + si
      val ln = (A * (x - si)) + ((1.0 - A) * (l + b))
      val bn = (B * (ln - l)) + ((1.0 - B) * b)
      val sn = (G * (x - ln)) + ((1.0 - G) * si)
      l = ln; b = bn; s(idx) = sn
      (l, b, sn, Some(fit))
    }
  }

  private def run(rows: Seq[(Long, Long, Double)]) =
    TimeOps.holtWinters(rows.toDF("user_id", "ts_us", "value"),
        "value", Seq("user_id"), Seq("ts_us"), A, B, G, M)
      .orderBy("user_id", "ts_us")
      .collect().map(r => (r.getLong(0),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))

  test("matches the reference recursion bit-for-bit, per series, with state reset") {
    val xs1 = Seq(29.61, 143.51, 113.39, 11.0, 162.27, 7.72, 55.0)
    val xs2 = Seq(5.0, 6.0, 7.0)
    val rows = xs1.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
      xs2.zipWithIndex.map { case (v, i) => (2L, i.toLong, v) }
    val out = run(rows)
    val expected = ref(xs1).map(e => (1L, e._1, e._2, e._3, e._4)) ++
      ref(xs2).map(e => (2L, e._1, e._2, e._3, e._4))
    assert(out.toSeq.map(o => (o._1, o._2, o._3, o._4, o._5)) == expected,
      s"got ${out.toSeq}\nexp $expected")
  }

  test("a pure period-4 signal: seasonal indices absorb the cycle, forecasts converge") {
    val cycle = Seq(10.0, 50.0, 30.0, 70.0)
    val xs = Seq.fill(20)(cycle).flatten
    val rows = xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
    val out = run(rows)
    // late one-step forecast error must be far below the early error
    val errs = out.zip(xs).collect { case ((_, _, _, _, Some(f)), x) => math.abs(f - x) }
    val early = errs.slice(1, 9).sum / 8
    val late = errs.takeRight(8).sum / 8
    assert(late < early / 5, s"forecasts must converge: early $early late $late")
  }
}
