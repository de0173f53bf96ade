package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the distinct-counting pair: exact `count_distinct` plans the
  * two-phase distinct (a partial aggregation on (group, key) BEFORE
  * the exchange — the shuffle carries distinct pairs, never raw rows),
  * and the 100 TB one-pass path `approx_count_distinct` (HLL++, fixed
  * sketch per group, default rsd 5%) stays within its relative-error
  * contract of the exact counts.
  */
class DistinctCountSpec extends SparkSpec {
  import spark.implicits._

  // 6 groups × up to 400 distinct keys, each key repeated 1-3×
  private lazy val df = (for {
    g <- 0 until 6
    k <- 0 until 50 * (g + 2)
    rep <- 0 to (k % 3)
  } yield (s"g$g", (g * 100000 + k).toLong, rep)).toDF("grp", "key", "rep")

  test("approx_count_distinct is within 5x its rsd of the exact count per group") {
    val joined = df.groupBy("grp").agg(
      count_distinct(col("key")).as("exact"),
      approx_count_distinct(col("key"), 0.02).as("approx"))
      .collect()
    assert(joined.length == 6)
    joined.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.10, s"${r.getString(0)}: exact=$exact approx=$approx relErr=$relErr")
    }
  }

  test("exact count_distinct plans a partial aggregation before the exchange") {
    val q = df.groupBy("grp").agg(count_distinct(col("key")).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    // two-phase distinct: the first HashAggregate (bottom of the plan,
    // BEFORE any exchange) groups on (grp, key) — the map-side dedup
    // that keeps the shuffle linear in DISTINCT pairs, not input rows
    val firstExchange = plan.indexOf("Exchange hashpartitioning")
    assert(firstExchange >= 0, "expected a hash exchange in the plan")
    val belowExchange = plan.substring(firstExchange)
    assert(belowExchange.contains("HashAggregate(keys=[grp"),
      s"expected a partial aggregate keyed on (grp, key) below the exchange:\n${plan.take(1500)}")
  }
}
