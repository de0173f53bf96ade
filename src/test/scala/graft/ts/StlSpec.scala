package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Stl.robustDecompose — STL-style robust decomposition (loess
  * trend + bisquare reweighting) — against an INDEPENDENT loop-based
  * reimplementation of the same contract, plus the robustness property
  * that motivates it and the scale shape.
  */
class StlSpec extends SparkSpec {
  import spark.implicits._

  private val q = 7
  private val period = 7
  private val pattern = Array(5.0, -3.0, 0.0, 2.0, -4.0, 1.0, -1.0)

  /** value = 100 + 2t + weekly pattern, one wild outlier at t=20. */
  private def series(n: Int, outlierAt: Int = -1): IndexedSeq[Double] =
    (0 until n).map { t =>
      val base = 100.0 + 2.0 * t + pattern(t % period)
      if (t == outlierAt) base + 100000.0 else base
    }

  /** Loop-based golden: same literal tables, same fold order, same s4
    * integer space as Stl.robustDecompose — written independently with
    * plain while-style loops so a Spark-side wiring bug cannot hide.
    * Returns (trend_s4, seasonal_s4, remainder_s4, rho_s4) per row
    * (None = null).
    */
  private def golden(v: IndexedSeq[Double], phaseOf: Int => Int)
      : IndexedSeq[(Option[Long], Option[Long], Option[Long], Long)] = {
    val n = v.size
    val taps = -q to q
    val c1 = Stl.pass1Coefs(q)
    val wt = Stl.tricube(q)
    def s4(x: Double): Long = math.floor(x * 10000d + 0.5d).toLong
    // pass 1 trend (null off the edges)
    val trend1: IndexedSeq[Option[Double]] = (0 until n).map { t =>
      if (t - q < 0 || t + q >= n) None
      else Some(taps.map(i => c1(i + q) * v(t + i)).reduceLeft(_ + _))
    }
    val m: IndexedSeq[Option[Long]] = (0 until n).map(t => trend1(t).map(tr => s4(v(t) - tr)))
    // unweighted phase means of m (integer sums)
    val s1: Map[Int, Double] = (0 until n).groupBy(phaseOf).map { case (p, idxs) =>
      val ms = idxs.flatMap(m(_))
      p -> (ms.sum.toDouble / ms.size.toDouble / 10000d)
    }
    val a4: IndexedSeq[Option[Long]] =
      (0 until n).map(t => m(t).map(mm => math.abs(mm - s4(s1(phaseOf(t))))))
    val nonNull = a4.flatten.sorted
    val med: Option[Long] =
      if (nonNull.isEmpty) None else Some(nonNull((nonNull.size + 1) / 2 - 1))
    val rho: IndexedSeq[Double] = (0 until n).map { t =>
      (a4(t), med) match {
        case (None, _) | (_, None) => 1.0
        case (Some(a), Some(md)) =>
          val h = md * 6L
          if (h == 0) 1.0
          else {
            val u = a.toDouble / h.toDouble
            if (u >= 1.0) 0.0 else { val b = 1.0 - u * u; b * b }
          }
      }
    }
    // pass 2: weighted local-linear fit at the center
    val trend2: IndexedSeq[Option[Double]] = (0 until n).map { t =>
      if (t - q < 0 || t + q >= n) None
      else {
        def fold(f: Int => Double): Double =
          taps.map(i => f(i)).reduceLeft(_ + _)
        val sS0 = fold(i => wt(i + q) * rho(t + i))
        val sS1 = fold(i => (wt(i + q) * i) * rho(t + i))
        val sS2 = fold(i => (wt(i + q) * i * i) * rho(t + i))
        val tT0 = fold(i => wt(i + q) * (rho(t + i) * v(t + i)))
        val tT1 = fold(i => (wt(i + q) * i) * (rho(t + i) * v(t + i)))
        val den = sS0 * sS2 - sS1 * sS1
        if (den == 0) None else Some((sS2 * tT0 - sS1 * tT1) / den)
      }
    }
    val d4: IndexedSeq[Option[Long]] = (0 until n).map(t => trend2(t).map(tr => s4(v(t) - tr)))
    val r4: IndexedSeq[Long] = rho.map(s4)
    val seas: Map[Int, Option[Double]] = (0 until n).groupBy(phaseOf).map { case (p, idxs) =>
      val pairs = idxs.collect { case t if d4(t).isDefined => (d4(t).get, r4(t)) }
      val sr = pairs.map(_._2).sum
      p -> (if (pairs.isEmpty || sr == 0) None
            else Some(pairs.map(pr => pr._1 * pr._2).sum.toDouble / sr.toDouble / 10000d))
    }
    (0 until n).map { t =>
      val sS4 = seas(phaseOf(t)).map(s4)
      (trend2(t).map(s4), sS4,
        for (d <- d4(t); s <- sS4) yield d - s, r4(t))
    }
  }

  private def runStl(v: IndexedSeq[Double], useKernel: Boolean = true,
      outerIters: Int = 1) = {
    val day = 86400000000L
    val rows = v.zipWithIndex.map { case (x, t) => (1L, t.toLong * day, x) }
    val daily = rows.toDF("user_id", "bucket", "filled_value")
    val phase = pmod(expr("bucket div 86400000000") + 3, lit(7)).cast("int")
    Stl.robustDecompose(daily, "filled_value", Seq("user_id"), "bucket", phase, q,
        useKernel = useKernel, outerIters = outerIters)
      .orderBy("bucket").collect()
  }

  test("kernel and declarative fold paths are bit-equal (outlier series)") {
    val v = series(42, outlierAt = 20)
    val k = runStl(v, useKernel = true)
    val d = runStl(v, useKernel = false)
    assert(k.length == d.length)
    k.zip(d).zipWithIndex.foreach { case ((a, b), t) =>
      (4 to 7).foreach { i =>
        assert(a.isNullAt(i) == b.isNullAt(i) &&
          (a.isNullAt(i) || a.getLong(i) == b.getLong(i)),
          s"t=$t col $i: $a vs $b")
      }
    }
  }

  test("golden: bit-exact vs the independent loop reimplementation (outlier series)") {
    val v = series(42, outlierAt = 20)
    val exp = golden(v, t => ((t + 3) % 7 + 7) % 7)
    val got = runStl(v)
    assert(got.length == v.size)
    got.zip(exp).zipWithIndex.foreach { case ((r, (et, es, erm, er4)), t) =>
      def l(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(l(4) == et, s"t=$t trend_s4: ${l(4)} vs $et")
      assert(l(5) == es, s"t=$t seasonal_s4: ${l(5)} vs $es")
      assert(l(6) == erm, s"t=$t remainder_s4: ${l(6)} vs $erm")
      assert(r.getLong(7) == er4, s"t=$t rho_s4: ${r.getLong(7)} vs $er4")
    }
  }

  test("robustness: the outlier's weight collapses and the nearby trend barely moves") {
    val clean = runStl(series(42))
    val spiked = runStl(series(42, outlierAt = 20))
    // the outlier row is effectively removed from every fit
    assert(spiked(20).getLong(7) == 0L, s"outlier rho must be 0: ${spiked(20)}")
    // interior trend near (not at) the outlier stays within 5.0 of
    // the clean series' trend — a NON-robust tricube MA would shift
    // by c_i·100000 ≈ 5,000-13,700 value units (5e7-1.4e8 s4) across
    // these rows (the property STL exists for)
    (10 until 30).filter(t => t != 20).foreach { t =>
      val a = clean(t).getLong(4); val b = spiked(t).getLong(4)
      assert(math.abs(a - b) <= 50000L,
        s"t=$t robust trend moved ${math.abs(a - b)} s4 (> 5.0) under one outlier")
    }
    // and the weekly pattern survives: per-phase seasonal unchanged
    // within 5.0 despite the spike landing in phase (20+3)%7
    (0 until 7).foreach { p =>
      val a = clean.find(r => r.getInt(3) == p && !r.isNullAt(5)).get.getLong(5)
      val b = spiked.find(r => r.getInt(3) == p && !r.isNullAt(5)).get.getLong(5)
      assert(math.abs(a - b) <= 50000L, s"phase $p seasonal: $a vs $b")
    }
  }

  test("outer iterations: a second bisquare pass further shrinks the outlier's leverage") {
    val clean = runStl(series(42))
    val spiked = series(42, outlierAt = 20)
    val one = runStl(spiked, outerIters = 1)
    val two = runStl(spiked, outerIters = 2)
    // pass-2 weights come from pass-1's ROBUST remainder (pass-1's came
    // from the polluted pass-1 fit), so the neighbors' trend moves back
    // toward the clean series' trend
    def dev(rows: Array[org.apache.spark.sql.Row]): Long =
      (10 until 30).filter(_ != 20).map { t =>
        math.abs(rows(t).getLong(4) - clean(t).getLong(4))
      }.sum
    val d1 = dev(one)
    val d2 = dev(two)
    assert(d2 < d1, s"second pass must shrink trend distortion: $d2 vs $d1 (s4)")
    // the outlier itself stays fully rejected on the second pass
    assert(two(20).getLong(7) == 0L, s"outlier rho after pass 2: ${two(20)}")
  }

  test("outer iterations: kernel and fold paths stay bit-equal at n_o = 2") {
    val v = series(42, outlierAt = 20)
    val k = runStl(v, useKernel = true, outerIters = 2)
    val d = runStl(v, useKernel = false, outerIters = 2)
    k.zip(d).zipWithIndex.foreach { case ((a, b), t) =>
      (4 to 7).foreach { i =>
        assert(a.isNullAt(i) == b.isNullAt(i) &&
          (a.isNullAt(i) || a.getLong(i) == b.getLong(i)),
          s"t=$t col $i: $a vs $b")
      }
    }
  }

  test("null mid-series: aggregate and fold verdicts align (incl. null fits)") {
    // a null value inside a frame: the fold path null-propagates the
    // taps; the frame-fold aggregate latches nullSeen — same NULL
    // verdict by construction, pinned here end-to-end through both
    // loess passes, the phase means, and the bisquare chain
    val day = 86400000000L
    val vOpt: IndexedSeq[Option[Double]] =
      series(42).map(Option(_)).updated(20, None)
    def runOpt(useKernel: Boolean) = {
      val rows = vOpt.zipWithIndex.map { case (x, t) => (1L, t.toLong * day, x) }
      val daily = rows.toDF("user_id", "bucket", "filled_value")
      val phase = pmod(expr("bucket div 86400000000") + 3, lit(7)).cast("int")
      Stl.robustDecompose(daily, "filled_value", Seq("user_id"), "bucket", phase, q,
          useKernel = useKernel)
        .orderBy("bucket").collect()
    }
    val k = runOpt(true)
    val d = runOpt(false)
    assert(k.length == d.length)
    k.zip(d).zipWithIndex.foreach { case ((a, b), t) =>
      (4 to 7).foreach { i =>
        assert(a.isNullAt(i) == b.isNullAt(i) &&
          (a.isNullAt(i) || a.getLong(i) == b.getLong(i)),
          s"t=$t col $i: $a vs $b")
      }
    }
    // the null row's ±q neighborhood must actually exercise null fits
    assert(k(20).isNullAt(4) && k(20 - q).isNullAt(4) && k(20 + q).isNullAt(4),
      "trend must be null within q of the null value")
    assert(!k(20 - q - 1).isNullAt(4) && !k(20 + q + 1).isNullAt(4),
      "trend must recover outside the null's frame reach")
  }

  test("decomposition adds back up: v*1e4 ≈ trend+seasonal+remainder (≤1 s4 quantization)") {
    val v = series(42, outlierAt = 20)
    runStl(v).foreach { r =>
      if (!r.isNullAt(4) && !r.isNullAt(5) && !r.isNullAt(6)) {
        val v4 = math.floor(r.getDouble(2) * 10000d + 0.5d).toLong
        val sum = r.getLong(4) + r.getLong(5) + r.getLong(6)
        assert(math.abs(v4 - sum) <= 1L, s"row $r: $v4 vs $sum")
      }
    }
  }

  test("strength: trended+seasonal series scores high on both; pure noise scores low") {
    val day = 86400000000L
    def frame(uid: Long, f: Int => Double) = (0 until 56).map { t =>
      (uid, t.toLong * day, f(t))
    }
    // structured: strong trend + strong weekly pattern, tiny wobble
    val structured = frame(1L, t => 100.0 + 5.0 * t + 20.0 * pattern(t % 7)
      + ((t * 2654435761L) % 97L).toDouble / 97.0)
    // noise: no trend, no seasonality — deterministic hash noise
    val noise = frame(2L, t => ((t * 2654435761L) % 9973L).toDouble / 99.0)
    val daily = (structured ++ noise).toDF("user_id", "bucket", "filled_value")
    val phase = pmod(expr("bucket div 86400000000") + 3, lit(7)).cast("int")
    val out = Stl.strength(
      Stl.robustDecompose(daily, "filled_value", Seq("user_id"), "bucket", phase, q),
      Seq("user_id")).collect().map(r => r.getLong(0) -> r).toMap
    val s = out(1L); val z = out(2L)
    assert(s.getDouble(2) > 0.95 && s.getDouble(3) > 0.9,
      s"structured series must score high: $s")
    assert(z.getDouble(2) < 0.6 && z.getDouble(3) < 0.6,
      s"hash noise must score low: $z")
    out.values.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0 &&
        r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"clamped to [0,1]: $r")
    }
  }

  test("scale shape: series-keyed windows, bounded kernel frames only, spillable median") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts_us", "value")
    val daily = TimeOps.resampleFfill(ev, Seq("user_id"), "ts_us", 86400000000L, max(col("value")))
      .select("user_id", "bucket", "filled_value")
    val phase = pmod(expr("bucket div 86400000000") + 3, lit(7)).cast("int")
    val plan = Stl.robustDecompose(daily, "filled_value", Seq("user_id"), "bucket", phase, q)
      .queryExecution.executedPlan.toString
    val lower = plan.toLowerCase
    // no unbounded buffering aggregation: the median is the rank pick,
    // and both loess passes run as frame-fold AGGREGATES (r21) over
    // BOUNDED ±q sliding frames — no collect_list materialization
    // anywhere in the plan, one Window node per pass
    assert(!plan.contains("sort_array"), s"no sort_array median:\n${plan.take(1500)}")
    assert(!lower.contains("collect_list") &&
      "specifiedwindowframe\\(rowframe, -7, 7\\)".r.findAllIn(lower).size == 2,
      s"exactly the two bounded aggregate frames, no collect_list:\n${plan.take(2000)}")
    assert(plan.linesIterator.count(l =>
        l.contains("Window [") && l.contains("RowFrame, -7, 7")) == 2,
      s"one WindowExec per loess pass:\n${plan.take(2000)}")
    assert(lower.contains("stlconvagg") && lower.contains("stlloessfitagg"),
      s"frame-fold aggregates must be in the executed plan:\n${plan.take(2000)}")
    assert(lower.contains("windowspecdefinition(user_id"),
      s"windows must key on the series:\n${plan.take(1500)}")
  }
}
