package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** REAL time-series fixture integrity (round 19): the 72 real_ts_*
  * twins re-bind the whole events-side engine onto the reference
  * library's own demo dataset (51 US locations × 274 daily
  * hospitalization counts — reference docs/demo_data.csv, converted by
  * tools/make_real_events.py). The driver gate CANNOT detect fixture
  * drift: Spark and the DuckDB oracle read the SAME parquet, so a
  * corrupted or accidentally-regenerated fixture stays "value-exact"
  * while silently gating different data. These pins are the only
  * guard; every value below is a property of the checked-in file, so
  * regenerating the fixture (a deliberate act) updates them with it.
  */
class RealEventsSpec extends SparkSpec {

  private def ev = graft.Tables.events(spark, graft.SparkEntry.realEventsDir)

  test("fixture shape: 51 series x 274 daily observations, unique ts per series") {
    val r = ev.agg(
      count(lit(1)), countDistinct(col("user_id")),
      countDistinct(col("event_type")),
      countDistinct(col("user_id"), col("ts_us"))).collect().head
    assert(r.getLong(0) == 13974L, s"rows ${r.getLong(0)}")
    assert(r.getLong(1) == 51L && r.getLong(2) == 51L)
    // the mannKendall/asof unique-timestamp contract holds on the
    // real data too: one observation per (series, day)
    assert(r.getLong(3) == 13974L, "duplicate (series, ts) pair")
    val lens = ev.groupBy("user_id").count().select(collect_set(col("count")))
      .collect().head.getSeq[Long](0)
    assert(lens == Seq(274L), s"ragged series: $lens")
  }

  test("fixture content: the reference demo data, byte-stable") {
    val r = ev.agg(
      min(col("ts_us")), max(col("ts_us")),
      sum(expr("cast(value * 100 as bigint)")),
      sum(expr("cast(value as bigint) * event_id")),
      sum(col("event_id")),
      sum(when(col("value") === 0d, 1L).otherwise(0L)),
      min(col("value")), max(col("value"))).collect().head
    // daily cadence endpoints: 2020-10-01 .. 2021-07-01 UTC midnight
    assert(r.getLong(0) == 1601510400000000L && r.getLong(1) == 1625097600000000L)
    // integer-cents value mass + an order-coupled checksum (catches a
    // value permutation that a plain sum would miss)
    assert(r.getLong(2) == 208248700L, s"value mass ${r.getLong(2)}")
    assert(r.getLong(3) == 13736511565L, s"coupled checksum ${r.getLong(3)}")
    assert(r.getLong(4) == 97643325L) // event_id = 1..13974 exactly once
    // the zero-inflation the twins exist to stress (ties for every
    // rank/median/quantile path) is genuinely present
    assert(r.getLong(5) == 84L, s"zero-count ${r.getLong(5)}")
    assert(r.getDouble(6) == 0d && r.getDouble(7) == 2580d)
    // spot value: the first AK observation (series rank 1)
    val first = ev.where(col("user_id") === 1).orderBy("ts_us")
      .select("event_type", "value").head()
    assert(first.getString(0) == "AK" && first.getDouble(1) == 3.0d)
  }
}
