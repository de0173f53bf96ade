package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Pins the ts_backtest_naive and q_pareto query shapes via
  * SparkEntry on hand-checkable inputs (both are inline compositions
  * of built-ins; the oracle gate carries cross-engine parity, this
  * spec carries the semantics).
  */
class BacktestParetoSpec extends SparkSpec {
  import spark.implicits._

  test("backtest: seasonal-naive wins on a pure period-4 signal, naive on a drifting one") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    def maes(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "ts_us", "__c")
        .withColumn("__e1", abs(col("__c") - lag("__c", 1).over(w)))
        .withColumn("__e4", abs(col("__c") - lag("__c", 4).over(w)))
        .groupBy("user_id")
        .agg(count(col("__e4")).as("n"),
          sum(when(col("__e4").isNotNull, col("__e1"))).as("s1"),
          sum(col("__e4")).as("s4"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    // period-4 cycle repeated: seasonal error is 0, naive error large
    val cyc = Seq(100L, 500L, 300L, 700L)
    val seasonal = (0 until 12).map(i => (1L, i.toLong, cyc(i % 4)))
    val (n1, s1a, s4a) = maes(seasonal)
    assert(n1 == 8L && s4a == 0L && s1a > 0L, s"($n1, $s1a, $s4a)")
    // steady drift +10: naive error 10/step, seasonal 40/step
    val drift = (0 until 12).map(i => (1L, i.toLong, 100L + 10L * i))
    val (n2, s1b, s4b) = maes(drift)
    assert(n2 == 8L && s1b == 80L && s4b == 320L, s"($n2, $s1b, $s4b)")
  }

  test("pareto: hand-built concentration — 1 whale of 5 customers carries 80%") {
    // revenues 80, 5, 5, 5, 5 (total 100): rank-1 cum = 80 → 5·80 ≥ 4·100
    // crossing at rank 1 → n_top80 = 1. Routed through the REGISTERED
    // query (the two-level bucketed prefix sum) via a temp parquet dir.
    val dir = java.nio.file.Files.createTempDirectory("graft_pareto").toString
    Seq((1L, 80.0), (2L, 5.0), (3L, 5.0), (4L, 5.0), (5L, 5.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_pareto")(spark, dir).collect().head
    assert(out.getAs[Long]("n_top80") == 1L, s"whale must carry the 80%: $out")
    assert(out.getAs[Long]("n_customers") == 5L, s"$out")
    assert(out.getAs[Long]("total_cents") == 10000L, s"$out")
  }

  test("pareto: two-level bucketed cumsum matches the brute-force global cumsum on sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_pareto")(spark, dir).collect().head
    // brute-force oracle: single global window over the tiny sf rollup
    val byCust = graft.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("__rev"))
    val w = Window.orderBy(col("__rev").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byCust.agg(sum(col("__rev")).as("__tot"), count(lit(1)).as("nc"))
    val exp = byCust.withColumn("__cum", sum(col("__rev")).over(w))
      .crossJoin(total)
      .where(col("__cum") * 5 >= col("__tot") * 4)
      .agg(count(lit(1)).as("above"), max(col("nc")).as("nc"), max(col("__tot")).as("tot"))
      .select((col("nc") - col("above") + 1).as("n_top80"), col("nc"), col("tot"))
      .collect().head
    assert(got.getAs[Long]("n_top80") == exp.getAs[Long]("n_top80"),
      s"got $got expected $exp")
    assert(got.getAs[Long]("n_customers") == exp.getAs[Long]("nc"), s"got $got expected $exp")
    assert(got.getAs[Long]("total_cents") == exp.getAs[Long]("tot"), s"got $got expected $exp")
  }

  test("pareto: no single-partition window over the customer rollup in the plan") {
    val plan = SparkEntry.queries("q_pareto")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the corpus-scaled cumsum must run under the __b bucket
    // partitioning: a partitioned Window prints a non-empty partition
    // list `Window [sum(__rev…], [__b#N], [__rev…]`; the forbidden
    // shape is the same sum with the order list directly after the
    // exprs (no partition list). The remaining SinglePartition
    // exchanges are one-row global aggs + the ≤1024-row bucket-totals
    // prefix — bounded, not corpus-scaled.
    assert("""Window \[sum\(__rev[^\]]*\], \[__b#\d+\]""".r.findFirstIn(plan).isDefined,
      s"missing __b-partitioned cumsum window:\n$plan")
    assert("""Window \[sum\(__rev[^\]]*\], \[__rev""".r.findFirstIn(plan).isEmpty,
      s"unpartitioned cumsum over the customer rollup:\n$plan")
  }
}
