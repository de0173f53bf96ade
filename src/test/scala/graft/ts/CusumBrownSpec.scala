package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CusumBrownSpec extends SparkSpec {
  import spark.implicits._

  test("cusum flags an upward mean shift and resets per group") {
    // group a: 8 quiet points then 6 shifted ones; group b: all quiet
    val rows =
      (1 to 8).map(t => ("a", t.toLong, 0.0)) ++
        (9 to 14).map(t => ("a", t.toLong, 10.0)) ++
        (1 to 14).map(t => ("b", t.toLong, 0.0))
    val df = rows.toDF("k", "ts", "x")
    val out = TimeOps.cusum(df, "x", Seq("k"), Seq("ts"), target = 0.0, slack = 0.5, threshold = 20.0)
      .orderBy("k", "ts").collect()
    val a = out.filter(_.getString(0) == "a")
    val b = out.filter(_.getString(0) == "b")
    // quiet prefix: deviations are -0.5, clipped at 0 → no accumulation
    assert(a.take(8).forall(r => r.getDouble(3) == 0.0 && !r.getBoolean(5)))
    // after the shift each point adds 9.5; alarm crosses 20 at the 3rd
    assert(a(10).getDouble(3) == 28.5 && a(10).getBoolean(5))
    assert(a.last.getDouble(4) == 0.0, "downward side stays clipped on an upward shift")
    // group b never alarms — state did not leak across the group change
    assert(b.forall(r => r.getDouble(3) == 0.0 && !r.getBoolean(5)))
  }

  test("cusum downward side mirrors the upward side") {
    val df = ((1 to 5).map(t => ("a", t.toLong, 10.0)) ++
      (6 to 10).map(t => ("a", t.toLong, 0.0))).toDF("k", "ts", "x")
    val out = TimeOps.cusum(df, "x", Seq("k"), Seq("ts"), target = 10.0, slack = 1.0, threshold = 15.0)
      .orderBy("ts").collect()
    assert(out.take(5).forall(_.getDouble(4) == 0.0))
    assert(out.last.getDouble(4) == 45.0) // 5 points × (10 − 1 − 0)
    assert(out.last.getBoolean(5))
  }

  test("cusum null observations keep the state and emit null") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(5.0)))
      .toDF("k", "ts", "x")
    val out = TimeOps.cusum(df, "x", Seq("k"), Seq("ts"), target = 0.0, slack = 0.0, threshold = 100.0)
      .orderBy("ts").collect()
    assert(out(1).isNullAt(3) && out(1).isNullAt(5))
    assert(out(2).getDouble(3) == 10.0, "state must survive the null row")
  }

  test("brownSmoothing's first smoother is exactly TimeOps.ewma") {
    val df = (1 to 40).map(t => ("a" + (t % 3), t.toLong, math.sin(t * 0.7) * 10 + t))
      .toDF("k", "ts", "x")
    val brown = TimeOps.brownSmoothing(df, "x", Seq("k"), Seq("ts"), alpha = 0.3)
      .select("k", "ts", "ewma1").orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val e = TimeOps.ewma(df, "x", Seq("k"), Seq("ts"), alpha = 0.3)
      .select("k", "ts", "ewma").orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(brown.toSeq == e.toSeq, "ewma1 must be bit-identical to the standalone ewma")
  }

  test("brownSmoothing tracks a linear trend: forecast1 converges to the next value") {
    val df = (1 to 200).map(t => ("a", t.toLong, 3.0 + 2.0 * t)).toDF("k", "ts", "x")
    val out = TimeOps.brownSmoothing(df, "x", Seq("k"), Seq("ts"), alpha = 0.3)
      .orderBy("ts").collect()
    val last = out.last
    val nextTrue = 3.0 + 2.0 * 201
    // columns: k, ts, x, ewma1, ewma2, level, trend, forecast1
    assert(math.abs(last.getDouble(6) - 2.0) < 0.1, s"trend ≈ slope, got ${last.getDouble(6)}")
    assert(math.abs(last.getDouble(7) - nextTrue) < 0.5,
      s"forecast1 ${last.getDouble(7)} must approach $nextTrue")
  }
}
