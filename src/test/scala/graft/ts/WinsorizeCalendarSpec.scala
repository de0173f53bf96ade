package graft.ts

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class WinsorizeCalendarSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize (bounded histogram route) clips to type-1 group bounds, interiors verbatim") {
    val df = ((1 to 100).map(i => (1, i.toDouble)) :+ ((2, 1000.0))).toDF("g", "v")
    val out = TimeOps.winsorize(df, "v", Seq("g"), 5, 95, "vw")
      .where($"g" === 1).select("v", "vw").as[(Double, Double)].collect().toMap
    // type-1 bounds over 1..100: rank ceil(0.05·100)=5 → 5.0,
    // rank ceil(0.95·100)=95 → 95.0 — OBSERVED values, not interpolated
    assert(out(1.0) == 5.0 && out(3.0) == 5.0, "low outliers clip to the p05 element")
    assert(out(100.0) == 95.0, "high outliers clip to the p95 element")
    assert(out(5.0) == 5.0 && out(95.0) == 95.0, "bound elements themselves untouched")
    assert(out(50.0) == 50.0, "interior values untouched")
    // single-row group: both bounds are the value itself
    val g2 = TimeOps.winsorize(df, "v", Seq("g"), 5, 95, "vw")
      .where($"g" === 2).select("vw").as[Double].head()
    assert(g2 == 1000.0)
  }

  test("winsorizeExactPercentile (showcase twin) interpolates like quantile_cont") {
    val df = ((1 to 100).map(i => (1, i.toDouble)) :+ ((2, 1000.0))).toDF("g", "v")
    val out = TimeOps.winsorizeExactPercentile(df, "v", Seq("g"), 0.05, 0.95, "vw")
      .where($"g" === 1).select("v", "vw").as[(Double, Double)].collect().toMap
    // percentile(0.05) over 1..100 = 5.95, percentile(0.95) = 95.05
    assert(out(1.0) == 5.95 && out(3.0) == 5.95, "low outliers clip to p05")
    assert(out(100.0) == 95.05, "high outliers clip to p95")
    assert(out(50.0) == 50.0, "interior values untouched")
  }

  test("robustZscore (bounded histogram route): hand-computed median/MAD, zero-MAD gates null") {
    // 1..9: med cents = 500 (rank ceil(4.5)=5), deviations sorted
    // 0,100,100,200,200,300,300,400,400 → MAD cents = 200
    val df = (1 to 9).map(i => (1, i.toDouble)).toDF("g", "v")
    val rz = TimeOps.robustZscore(df, "v", Seq("g"), "rz")
      .select("v", "rz").as[(Double, Double)].collect().toMap
    assert(rz(5.0) == 0.0, "median row scores 0")
    assert(rz(9.0) == 400.0 / (1.4826 * 200.0), s"hand-computed rz: ${rz(9.0)}")
    // constant group: MAD = 0 → null, never ±Inf
    val const = Seq((1, 7.0), (1, 7.0), (1, 7.0)).toDF("g", "v")
    val gated = TimeOps.robustZscore(const, "v", Seq("g"), "rz")
      .select("rz").collect()
    assert(gated.forall(_.isNullAt(0)), "zero MAD must gate to null")
  }

  test("hampel: a spike repairs to the window median; clean rows and edges pass through") {
    // steady ramp with one wild spike at t=10
    val rows = (0 until 21).map { t =>
      (1, t.toLong, if (t == 10) 1000.0 else 50.0 + t)
    }
    val out = TimeOps.hampel(rows.toDF("g", "ts", "v"), "v", Seq("g"), Seq("ts"), k = 3)
      .orderBy("ts").collect()
    val spike = out(10)
    assert(spike.getBoolean(3), s"spike must flag: $spike")
    // centered window at t=10: values 57,58,59,1000,61,62,63 → sorted
    // lower median (rank 4) = 61.0
    assert(spike.getDouble(4) == 61.0, s"spike repairs to the window median: $spike")
    // neighbors are NOT flagged (the median shrugs the spike off) and
    // pass through verbatim
    (7 to 13).filter(_ != 10).foreach { t =>
      assert(!out(t).getBoolean(3) && out(t).getDouble(4) == 50.0 + t, s"t=$t: ${out(t)}")
    }
    // edge rows (incomplete centered window) pass through unflagged
    (0 to 2).foreach { t =>
      assert(!out(t).getBoolean(3) && out(t).getDouble(4) == 50.0 + t, s"edge t=$t: ${out(t)}")
    }
    // constant series: MAD = 0, dev = 0 → 0 > 0 false → nothing flags
    val const = (0 until 9).map(t => (1, t.toLong, 5.0)).toDF("g", "ts", "v")
    val c = TimeOps.hampel(const, "v", Seq("g"), Seq("ts"), k = 2).collect()
    assert(c.forall(r => !r.getBoolean(3) && r.getDouble(4) == 5.0))
    // a series SHORTER than k+1: every window is sub-median-rank —
    // must pass through, not throw (ANSI element_at would raise on
    // the edge windows before the full-window gate applies)
    val short = Seq((1, 0L, 1.0), (1, 1L, 99.0)).toDF("g", "ts", "v")
    val s = TimeOps.hampel(short, "v", Seq("g"), Seq("ts"), k = 3)
      .orderBy("ts").collect()
    assert(s.map(_.getDouble(4)).toSeq == Seq(1.0, 99.0) && s.forall(!_.getBoolean(3)))
  }

  test("plan pin: winsorize + robustZscore plans carry NO percentile window (bounded at 100x)") {
    // parquet read, not toDF: LocalRelation plan pins constant-fold
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id", "value")
    for (plan <- Seq(
        TimeOps.winsorize(ev, "value", Seq("user_id"), 5, 95, "vw"),
        TimeOps.robustZscore(ev, "value", Seq("user_id"), "rz"))) {
      val phys = plan.queryExecution.executedPlan.toString
      assert(!phys.contains("percentile"),
        s"bounded route must not plan a percentile agg:\n${phys.take(2000)}")
    }
  }

  test("calendarFeatures: known dates map to the right weekday/hour/month") {
    // 1970-01-01 (Thursday) 00:00 and 2021-06-05 (Saturday) 13:30 UTC
    val satUs = 1622899800000000L // 2021-06-05T13:30:00Z
    val df = Seq((1L, 0L), (2L, satUs)).toDF("id", "ts_us")
    val out = TimeOps.calendarFeatures(df, "ts_us").orderBy("id")
      .select("dow", "is_weekend", "hour_of_day", "month", "year").collect()
    assert(out(0).getInt(0) == 3 && !out(0).getBoolean(1) && out(0).getInt(2) == 0)
    assert(out(0).getInt(3) == 1 && out(0).getInt(4) == 1970)
    assert(out(1).getInt(0) == 5 && out(1).getBoolean(1) && out(1).getInt(2) == 13)
    assert(out(1).getInt(3) == 6 && out(1).getInt(4) == 2021)
  }

  test("repetitionRatio: fully repeated text scores high, unique text scores 0") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "ab")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.repetitionRatio($"text", 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0, "all bigrams unique")
    assert(out(2L) > 0.8, s"degenerate repetition must score high, got ${out(2L)}")
    assert(out(3L) == 0.0, "too short for bigrams -> 0")
  }
}
