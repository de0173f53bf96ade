package graft.ts

import graft.SparkSpec

/** DFA(1) (ts_dfa): brute-force parity under the documented recipe,
  * the α regime separation (noise ≈ 0.5, random walk ≈ 1.5 — the
  * detrended scale R/S can't reach), drift robustness, and the
  * short/degenerate contracts.
  */
class DfaSpec extends SparkSpec {

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed * 6364136223846793005L + 1442695040888963407L)(
      _ * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  private def bruteDfa(xs: Array[Double], sizes: Seq[Int]): (Map[Int, Double], Option[Double]) = {
    val sh = xs.map(_ - xs.head)
    val mean = sh.sum / sh.length
    val y = sh.map(_ - mean).scanLeft(0.0)(_ + _).tail
    val fs = sizes.flatMap { m =>
      val blocks = y.grouped(m).filter(_.length == m).toSeq
      if (blocks.isEmpty) None
      else {
        val skc = m * (m + 1) / 2.0
        val skkc = m * (m + 1) * (2 * m + 1) / 6.0
        val ssrs = blocks.map { blk =>
          val sy = blk.sum
          val sky = blk.zipWithIndex.map { case (v, i) => (i + 1).toDouble * v }.sum
          val b = (m * sky - skc * sy) / (m * skkc - skc * skc)
          val a = (sy - b * skc) / m
          // explicit residuals — the stable form the engine uses (the
          // Σy²-based shortcut cancels catastrophically on long series)
          blk.zipWithIndex.map { case (v, i) => val r = v - a - b * (i + 1); r * r }.sum
        }
        val tot = ssrs.sum
        if (tot > 0) Some(m -> math.sqrt(tot / (ssrs.length.toDouble * m))) else None
      }
    }.toMap
    val alpha = if (sizes.forall(m => fs.get(m).exists(_ > 0))) {
      val pts = sizes.map(m => (math.log(m.toDouble), math.log(fs(m))))
      val n = pts.length
      val sx = pts.map(_._1).sum; val sy2 = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
      Some((n * sxy - sx * sy2) / (n * sxx - sx * sx))
    } else None
    (fs, alpha)
  }

  private def run(xs: Array[Double]) = {
    val s = spark
    import s.implicits._
    val df = xs.zipWithIndex
      .map { case (v, i) => (1L, i.toLong * 1000L, i.toLong, v) }.toSeq
      .toDF("user_id", "ts_us", "event_id", "value")
    TimeOps.dfa(df, "value", Seq("user_id"), Seq("ts_us", "event_id")).collect()(0)
  }

  test("brute-force parity on a 256-point noise series (per-size F and alpha)") {
    val xs = lcg(17L).take(256).toArray
    val row = run(xs)
    val (fs, alpha) = bruteDfa(xs, Seq(8, 16, 32, 64))
    Seq(8, 16, 32, 64).zipWithIndex.foreach { case (m, i) =>
      assert(math.abs(row.getDouble(6 + i) - fs(m)) < 2e-4, s"f_$m")
      assert(row.getLong(2 + i) == (256 / m).toLong, s"nb_$m")
    }
    assert(math.abs(row.getDouble(10) - alpha.get) < 2e-4, "alpha vs brute force")
  }

  test("regimes: noise ≈ 0.5, random walk well above 1 — and drift doesn't fake memory") {
    val noise = lcg(23L).take(512).toArray
    val walk = lcg(29L).take(512).toArray.scanLeft(0.0)(_ + _).tail
    val drifted = noise.zipWithIndex.map { case (v, i) => v + 0.002 * i } // linear drift
    val aNoise = run(noise).getDouble(10)
    val aWalk = run(walk).getDouble(10)
    val aDrift = run(drifted).getDouble(10)
    assert(aNoise > 0.3 && aNoise < 0.75, s"noise alpha=$aNoise")
    assert(aWalk > 1.1, s"walk alpha=$aWalk")
    // DFA's point: a per-block linear trend is REMOVED, so drifted
    // noise must read close to the undrifted noise, not like a walk
    assert(math.abs(aDrift - aNoise) < 0.15,
      s"drift must not fake long memory: drifted=$aDrift noise=$aNoise")
  }

  test("numerical stability: a steep long ramp reads the theory value α ≈ 2") {
    // the cancellation stress: the profile of a slope-3 ramp reaches
    // ~n²-scale values, so the Σy²-shortcut SSres is pure garbage
    // (it read α = 0.20 on the 10⁷-point monster); the residual form
    // must recover the curvature-dominated theory value α = 2 exactly
    // at any length
    val n = 4096
    val xs = Array.tabulate(n)(i => 3.0 * i + (((i * 2654435761L) >>> 8) % 1000L) / 100.0)
    val a = run(xs).getDouble(10)
    assert(math.abs(a - 2.0) < 0.05, s"steep ramp must read α≈2, got $a")
  }

  test("short series keeps its row with null alpha; a pure line nulls everything") {
    val short = run(lcg(31L).take(6).toArray)
    assert(short.getLong(1) == 6L && short.getLong(2) == 0L && short.isNullAt(10))
    val line = run(Array.tabulate(64)(i => 3.0 * i)) // profile exactly quadratic…
    // …but each BLOCK's linear fit on a line-integrated profile leaves
    // nonzero curvature except for constant input; a CONSTANT series
    // has an identically-zero profile → every F null
    val const = run(Array.fill(64)(5.0))
    (6 to 10).foreach(i => assert(const.isNullAt(i), s"constant col $i"))
    assert(!line.isNullAt(10), "a ramp still yields a defined alpha")
  }
}
