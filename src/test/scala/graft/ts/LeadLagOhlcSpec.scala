package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LeadLagOhlcSpec extends SparkSpec {
  import spark.implicits._

  test("leadLagCorr finds the planted echo lag") {
    // x_t = sin(2π t / 4): period-4 signal → ACF peaks at lag 4
    val df = (0 until 200).map(t => ("a", t.toLong, math.sin(t * math.Pi / 2.0) + 0.001 * t))
      .toDF("k", "t", "x")
    val out = TimeOps.leadLagCorr(df, "x", Seq("k"), Seq("t"), maxLag = 5)
      .collect().head
    assert(out.getInt(out.fieldIndex("best_lag")) == 4,
      s"period-4 signal must echo at lag 4, got row $out")
    val r4 = out.getDouble(out.fieldIndex("r_lag4"))
    val r2 = out.getDouble(out.fieldIndex("r_lag2"))
    assert(r4 > 0.9 && r2 < 0.0, s"acf shape wrong: r4=$r4 r2=$r2")
  }

  test("leadLagCorr best_lag tie-break prefers the smallest lag") {
    // constant-free white-ish noise with a deterministic seed: correlations
    // differ, but planting an exact tie is fragile — instead verify the
    // chain picks lag 1 when all correlations are equal (constant+trend
    // series: every lag correlates ~1)
    val df = (0 until 100).map(t => ("a", t.toLong, t.toDouble)).toDF("k", "t", "x")
    val out = TimeOps.leadLagCorr(df, "x", Seq("k"), Seq("t"), maxLag = 3).collect().head
    assert(out.getInt(out.fieldIndex("best_lag")) == 1,
      s"all-equal correlations must resolve to lag 1, got $out")
  }

  test("durbin-levinson pacf identifies an AR(1) process") {
    // AR(1), phi=0.7: acf_k = phi^k but pacf cuts off after lag 1
    val rnd = new scala.util.Random(11)
    var x = 0.0
    val xs = (0 until 2000).map { _ => x = 0.7 * x + rnd.nextGaussian(); x }
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }.toDF("k", "t", "x")
    val ll = TimeOps.leadLagCorr(df, "x", Seq("k"), Seq("t"), maxLag = 3)
    val r = ll.collect().head
    val (r1, r2, r3) = (r.getDouble(r.fieldIndex("r_lag1")),
      r.getDouble(r.fieldIndex("r_lag2")), r.getDouble(r.fieldIndex("r_lag3")))
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - p2 * r1
    val p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
    assert(math.abs(r1 - 0.7) < 0.08, s"acf1 $r1 should approach phi")
    assert(math.abs(p2) < 0.08 && math.abs(p3) < 0.08,
      s"AR(1) pacf must cut off after lag 1: p2=$p2 p3=$p3")
  }

  test("expandingTrend recovers a planted linear trend exactly") {
    // y = 2x + 5: slope/intercept exact from the second row on, r2 = 1
    val rows = (0 until 10).map(i => ("u", i.toLong * 100, i.toLong, 2.0 * i + 5.0))
    val df = rows.toDF("user_id", "ts_us", "event_id", "value")
    val out = TimeOps.expandingTrend(df, "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .orderBy("ts_us").collect()
    assert(out.length == 10)
    assert(out.head.isNullAt(out.head.fieldIndex("slope")), "single point has no slope")
    out.drop(1).foreach { r =>
      assert(r.getDouble(r.fieldIndex("slope")) == 2.0, s"slope: $r")
      assert(r.getDouble(r.fieldIndex("intercept")) == 5.0, s"intercept: $r")
    }
    // r2 of an exact line is 1 from the 2-point prefix on
    out.drop(2).foreach(r => assert(r.getDouble(r.fieldIndex("r2")) == 1.0, s"r2: $r"))
    // flat series: slope 0, intercept = the constant, r2 undefined
    val flat = (0 until 5).map(i => ("u", i.toLong, i.toLong, 3.5))
      .toDF("user_id", "ts_us", "event_id", "value")
    val f = TimeOps.expandingTrend(flat, "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .orderBy("ts_us").collect().last
    assert(f.getDouble(f.fieldIndex("slope")) == 0.0 &&
      f.getDouble(f.fieldIndex("intercept")) == 3.5 &&
      f.isNullAt(f.fieldIndex("r2")), s"flat: $f")
  }

  test("expandingTrend skips null values while positions keep advancing") {
    // v null at t=1 and t=3: the fit uses only non-null (x, v) pairs,
    // but x is the ROW position (nulls still occupy a slot — pandas
    // dropna-on-y semantics). Reference fold accumulates in the same
    // ascending order as the window frame, so doubles match exactly.
    val vals: Seq[Option[Double]] =
      Seq(Some(1.0), None, Some(2.5), None, Some(7.0), Some(3.25))
    val rows = vals.zipWithIndex.map { case (v, i) => ("u", i.toLong, i.toLong, v) }
    val df = rows.toDF("user_id", "ts_us", "event_id", "value")
    val out = TimeOps.expandingTrend(df, "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .orderBy("ts_us").collect()
    var (n, sx, sv, sxx, svv, sxv) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    vals.zipWithIndex.foreach { case (vOpt, i) =>
      vOpt.foreach { v =>
        val x = i.toDouble
        n += 1; sx += x; sv += v; sxx += x * x; svv += v * v; sxv += x * v
      }
      val r = out(i)
      assert(r.getLong(r.fieldIndex("trend_n")) == n.toLong, s"n at $i")
      val vx = n * sxx - sx * sx
      if (vx <= 0) assert(r.isNullAt(r.fieldIndex("slope")), s"slope at $i must be null")
      else {
        val slope = (n * sxv - sx * sv) / vx
        assert(r.getDouble(r.fieldIndex("slope")) == slope, s"slope at $i")
        assert(r.getDouble(r.fieldIndex("intercept")) == (sv - slope * sx) / n, s"intercept at $i")
      }
    }
  }

  test("ohlc aggregation picks the right endpoints") {
    val rows = Seq(
      ("a", 10L, 5.0), ("a", 20L, 9.0), ("a", 30L, 1.0), ("a", 40L, 7.0))
    val df = rows.toDF("user_id", "ts_us", "value")
    val out = df.groupBy(col("user_id"))
      .agg(min_by(col("value"), col("ts_us")).as("open"),
        max("value").as("high"), min("value").as("low"),
        max_by(col("value"), col("ts_us")).as("close"))
      .collect().head
    assert(out.getDouble(1) == 5.0 && out.getDouble(2) == 9.0 &&
      out.getDouble(3) == 1.0 && out.getDouble(4) == 7.0, out.toString)
  }
}
