package graft.ts

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class WinsorizeCalendarSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to the group's exact percentiles, leaving interior values alone") {
    val df = ((1 to 100).map(i => (1, i.toDouble)) :+ ((2, 1000.0))).toDF("g", "v")
    val out = TimeOps.winsorize(df, "v", Seq("g"), 0.05, 0.95, "vw")
      .where($"g" === 1).select("v", "vw").as[(Double, Double)].collect().toMap
    // percentile(0.05) over 1..100 = 5.95, percentile(0.95) = 95.05
    assert(out(1.0) == 5.95 && out(3.0) == 5.95, "low outliers clip to p05")
    assert(out(100.0) == 95.05, "high outliers clip to p95")
    assert(out(50.0) == 50.0, "interior values untouched")
    // single-row group: both percentiles are the value itself
    val g2 = TimeOps.winsorize(df, "v", Seq("g"), 0.05, 0.95, "vw")
      .where($"g" === 2).select("vw").as[Double].head()
    assert(g2 == 1000.0)
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
