package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial event-series shapes the driver-generated stream never
  * contains — single-event, constant-value (stddev = MAD = 0),
  * huge-magnitude (1e12: catastrophic cancellation territory) —
  * pinned Spark-side after the r16 events edge fixture
  * (tools/make_events_edge_fixture.py runs the full DuckDB gate on
  * the same shapes; this spec is the fast regression net).
  */
class EdgeEventsSpec extends SparkSpec {
  import spark.implicits._

  private val evGroup = Seq("user_id")
  private val evOrder = Seq("ts_us", "event_id")

  test("rollstd is numerically honest at 1e12 magnitudes (no negative variance)") {
    // values 1e12 + i: true sample std of any 7-window is ~2.16; the
    // old s2 − s1²/n form cancelled to NEGATIVE variance here → NaN
    // (and a hard sqrt error in the DuckDB twin)
    val rows = (0 until 10).map(i => (1L, i.toLong * 60L, i.toLong, 1.0e12 + i))
    val out = Featurize.rollStats(rows.toDF("user_id", "ts_us", "event_id", "value"),
      Seq("value"), evGroup, evOrder, Seq(7)).df
      .orderBy("ts_us").collect()
    val stds = out.drop(6).map(_.getDouble(6)) // full windows only
    assert(stds.nonEmpty && stds.forall(s => !s.isNaN && s > 2.0 && s < 2.3),
      s"7-window std of consecutive ints must be ~2.16: ${stds.mkString(",")}")
  }

  test("rollstd of a constant window is exactly 0.0 (kernel and declarative agree)") {
    val rows = (0 until 12).map(i => (1L, i.toLong, i.toLong, 7.5))
    val df = rows.toDF("user_id", "ts_us", "event_id", "value")
    for (useKernel <- Seq(true, false)) {
      val out = Featurize.rollStats(df, Seq("value"), evGroup, evOrder, Seq(7),
        useKernel = useKernel).df.orderBy("ts_us").collect()
      val stds = out.drop(6).map(_.getDouble(6))
      assert(stds.forall(_ == 0.0), s"kernel=$useKernel: ${stds.mkString(",")}")
    }
  }

  test("autocorr/moments at 1e12 magnitudes: finite, sane values (no cancellation garbage)") {
    // sin-shaped series offset by 1e12: the raw five-sums/power-sum
    // forms produced ±inf/NaN garbage here (and the two engines'
    // identical formulas produced DIFFERENT garbage — r16 events edge
    // fixture); the shifted/centered forms recover the honest values,
    // which are OFFSET-INVARIANT for autocorr/skew/kurt
    val mk = (off: Double) => (0 until 40)
      .map(i => (1L, i.toLong, i.toLong, off + math.sin(i * 0.7) * 10))
      .toDF("user_id", "ts_us", "event_id", "value")
    def acf(off: Double) = Featurize.autocorr(mk(off), "value", evGroup, evOrder,
      lagK = 1, w = 14).df.orderBy("ts_us").collect()
      .flatMap(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val base = acf(0.0)
    val huge = acf(1.0e12)
    assert(huge.forall(v => !v.isNaN && !v.isInfinite), s"finite: ${huge.take(5).mkString(",")}")
    base.zip(huge).foreach { case (b, h) =>
      assert(math.abs(b - h) < 1e-2, s"offset-invariance: $b vs $h")
    }
  }

  test("single-event and two-event series: windowed features null out, nothing crashes") {
    val rows = Seq((1L, 0L, 0L, 3.25), (2L, 0L, 1L, 1.0), (2L, 60L, 2L, 2.0))
    val df = rows.toDF("user_id", "ts_us", "event_id", "value")
    val rs = Featurize.rollStats(df, Seq("value"), evGroup, evOrder, Seq(7)).df.collect()
    assert(rs.length == 3 && rs.forall(_.isNullAt(6)), "minP=7 never fills")
    val zs = Featurize.zscore(df, "value", evGroup, evOrder, w = 7).df.collect()
    assert(zs.length == 3 && zs.forall(_.isNullAt(4)))
  }

  test("seasonal mean at a .00005 boundary is association-free (s4 integer sums)") {
    // A constant-level series with a period-7 additive pattern whose
    // phase-0 detrended values average EXACTLY onto a 4-decimal
    // rounding boundary. The former round(avg(det), 4) answered by FP
    // sum order — task/scan layout could flip the .00005 mean between
    // runs or engines. The s4 route floors each det to an int64 ONCE
    // (bit-determined by det), sums integers (association-free), and
    // divides in one fixed op order — the result is a pure function
    // of the data, pinned here across adversarial repartitionings.
    val season = Seq(0.0001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // alternate the phase-0 bump on and off so its det mean sits at
    // (0.0001 + 0)/2 = .00005 — the exact boundary
    val vals = (0 until 70).map(i => 10.0 + (if ((i / 7) % 2 == 0) season(i % 7) else 0.0))
    def run(parts: Int) = {
      val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
        .toDF("k", "pos", "x").repartition(parts)
      TimeOps.seasonalDecompose(df, "x", Seq("k"), Seq("pos"), period = 7,
          phase = pmod(col("pos"), lit(7)).cast("int"))
        .orderBy("pos").select("pos", "seasonal").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    }
    val a = run(1); val b = run(13)
    // bit-identical across partition layouts (compare raw bits, not ==)
    assert(a.length == b.length && a.zip(b).forall { case ((p1, v1), (p2, v2)) =>
      p1 == p2 && (v1.map(java.lang.Double.doubleToRawLongBits) ==
        v2.map(java.lang.Double.doubleToRawLongBits))
    }, "seasonal must be bit-identical under any partitioning")
  }
}
