package graft.ts

import graft.SparkSpec

/** Sample entropy (ts_sampen): brute-force parity under the exact
  * documented convention (s4 integer templates, integer tolerance r4
  * from floored 0.2σ, templates at i ≤ n−2), the regularity
  * separation the statistic exists for, and the prefix-cap /
  * degenerate-series contracts.
  */
class SampEnSpec extends SparkSpec {

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed * 6364136223846793005L + 1442695040888963407L)(
      _ * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  private def brute(xs: Array[Double]): (Long, Long, Long, Option[Double]) = {
    val sh = xs.map(_ - xs.head)
    val n = sh.length.toLong
    val s1 = sh.sum; val s2 = sh.map(x => x * x).sum
    val v = s2 / n - (s1 / n) * (s1 / n)
    val r4 = math.floor(0.2 * math.sqrt(math.max(v, 0.0)) * 1.0e4 + 0.5).toLong
    val v4 = sh.map(x => math.floor(x * 1.0e4 + 0.5).toLong)
    val idx = v4.indices.dropRight(2)
    var b = 0L; var a = 0L
    for (i <- idx; j <- idx if i < j) {
      if (math.abs(v4(i) - v4(j)) <= r4 && math.abs(v4(i + 1) - v4(j + 1)) <= r4) {
        b += 1
        if (math.abs(v4(i + 2) - v4(j + 2)) <= r4) a += 1
      }
    }
    val se = if (a > 0 && b > 0)
      Some(BigDecimal(math.log(b.toDouble / a.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    else None
    (r4, b, a, se)
  }

  private def run(xs: Array[Double], cap: Int = 2048) = {
    val s = spark
    import s.implicits._
    val df = xs.zipWithIndex
      .map { case (v, i) => (1L, i.toLong * 1000L, i.toLong, v) }.toSeq
      .toDF("user_id", "ts_us", "event_id", "value")
    TimeOps.sampleEntropy(df, "value", Seq("user_id"), Seq("ts_us", "event_id"),
      maxPoints = cap).collect()(0)
  }

  test("brute-force parity: r4, pair counts, and sampen on noise series") {
    Seq(11L, 12L, 13L).foreach { seed =>
      val xs = lcg(seed).take(80).toArray
      val row = run(xs)
      val (r4, b, a, se) = brute(xs)
      assert(row.getLong(3) == r4, s"seed=$seed r4")
      assert(row.getLong(4) == b, s"seed=$seed b_pairs")
      assert(row.getLong(5) == a, s"seed=$seed a_pairs")
      (se, if (row.isNullAt(6)) None else Some(row.getDouble(6))) match {
        case (Some(e), Some(g)) => assert(math.abs(e - g) < 1e-12, s"seed=$seed sampen")
        case (None, None) => ()
        case other => fail(s"seed=$seed sampen mismatch $other")
      }
    }
  }

  test("a periodic series is more regular (lower SampEn) than noise") {
    val periodic = Array.tabulate(120)(i => math.sin(2 * math.Pi * i / 12.0))
    val noise = lcg(21L).take(120).toArray
    val sePeriodic = run(periodic).getDouble(6)
    val seNoise = run(noise).getDouble(6)
    assert(sePeriodic < seNoise,
      s"periodic $sePeriodic should read more regular than noise $seNoise")
  }

  test("prefix cap: a longer series is computed on its first maxPoints, visibly") {
    val xs = lcg(31L).take(40).toArray
    val row = run(xs, cap = 16)
    assert(row.getLong(1) == 40L && row.getLong(2) == 16L)
    val (r4, b, a, _) = brute(xs.take(16))
    assert(row.getLong(3) == r4 && row.getLong(4) == b && row.getLong(5) == a)
  }

  test("constant series: every template matches, SampEn is exactly 0") {
    val row = run(Array.fill(20)(7.5))
    assert(row.getLong(3) == 0L, "r4 = 0")
    assert(row.getLong(4) == row.getLong(5) && row.getLong(4) > 0)
    assert(row.getDouble(6) == 0.0)
  }

  test("a too-short series yields zero pairs and a null statistic") {
    val row = run(Array(1.0, 2.0))
    assert(row.getLong(4) == 0L && row.getLong(5) == 0L && row.isNullAt(6))
  }
}
