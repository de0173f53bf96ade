package graft.ts

import graft.SparkSpec

/** R/S Hurst exponent (ts_hurst): brute-force parity on a literal
  * series, the statistical separation the estimator exists for (white
  * noise ≈ 0.5 vs random walk ≈ 1), and the null contracts (short
  * series, constant series).
  */
class HurstSpec extends SparkSpec {

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed * 6364136223846793005L + 1442695040888963407L)(
      _ * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  /** Straightforward reimplementation of the documented R/S recipe. */
  private def bruteHurst(xs: Array[Double], sizes: Seq[Int]): (Map[Int, Double], Option[Double]) = {
    val avg = sizes.flatMap { m =>
      val rss = xs.grouped(m).filter(_.length == m).flatMap { blk0 =>
        val blk = blk0.map(_ - blk0.head)
        val tot = blk.sum
        val mean = tot / m
        val cums = blk.scanLeft(0.0)(_ + _).tail
        val zs = cums.zipWithIndex.map { case (c, i) => c - (i + 1) * mean }
        val v = blk.map(x => x * x).sum / m - mean * mean
        if (v > 0) Some((zs.max - zs.min) / math.sqrt(v)) else None
      }.toSeq
      if (rss.nonEmpty) Some(m -> rss.sum / rss.length) else None
    }.toMap
    val h = if (sizes.forall(m => avg.get(m).exists(_ > 0))) {
      // H is the slope against ln(m); the engine computes it as the
      // slope against the integer exponent divided by ln 2 — equal
      val pts = sizes.map(m => (math.log(m.toDouble), math.log(avg(m))))
      val n = pts.length
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
      Some((n * sxy - sx * sy) / (n * sxx - sx * sx))
    } else None
    (avg, h)
  }

  private def run(xs: Array[Double]) = {
    val s = spark
    import s.implicits._
    val df = xs.zipWithIndex
      .map { case (v, i) => (1L, i.toLong * 1000L, i.toLong, v) }.toSeq
      .toDF("user_id", "ts_us", "event_id", "value")
    TimeOps.hurst(df, "value", Seq("user_id"), Seq("ts_us", "event_id")).collect()(0)
  }

  test("brute-force parity on a 256-point noise series (per-size R/S and H)") {
    val xs = lcg(7L).take(256).toArray
    val row = run(xs)
    val (avg, h) = bruteHurst(xs, Seq(8, 16, 32, 64))
    Seq(8, 16, 32, 64).zipWithIndex.foreach { case (m, i) =>
      assert(math.abs(row.getDouble(6 + i) - avg(m)) < 2e-4, s"rs_$m")
      assert(row.getLong(2 + i) == (256 / m).toLong, s"nb_$m")
    }
    assert(math.abs(row.getDouble(10) - h.get) < 2e-4, "hurst vs brute force")
  }

  test("white noise reads ≈ 0.5, a random walk reads near 1") {
    val noise = lcg(3L).take(512).toArray
    val walk = lcg(5L).take(512).toArray.scanLeft(0.0)(_ + _).tail
    val hNoise = run(noise).getDouble(10)
    val hWalk = run(walk).getDouble(10)
    assert(hNoise > 0.3 && hNoise < 0.7, s"white noise H=$hNoise")
    assert(hWalk > 0.8, s"random walk H=$hWalk")
    assert(hWalk - hNoise > 0.25, "the estimator separates the two regimes")
  }

  test("a series too short for the largest size yields null H and nb_64 = 0") {
    val row = run(lcg(9L).take(50).toArray)
    assert(row.getLong(5) == 0L, "no full 64-block")
    assert(row.isNullAt(10), "H needs every size")
    assert(!row.isNullAt(6), "the 8-blocks still report")
  }

  test("a constant series nulls every R/S (zero variance) and H") {
    val row = run(Array.fill(128)(42.0))
    (6 to 10).foreach(i => assert(row.isNullAt(i), s"col $i"))
    (2 to 5).foreach(i => assert(row.getLong(i) == 0L, "no valid blocks"))
  }
}
