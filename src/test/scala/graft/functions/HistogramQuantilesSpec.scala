package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Profile.histogramQuantiles — exact type-1 quantiles via a
  * bounded-cardinality value histogram.
  */
class HistogramQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(("q25", 25), ("q50", 50), ("q75", 75), ("q95", 95))

  test("hand-computed: duplicates, gaps, and rank boundaries") {
    // sorted: 1,1,2,3,5,5,5,9,10,10 (N=10)
    val df = Seq(5L, 1L, 10L, 3L, 5L, 2L, 9L, 1L, 5L, 10L).toDF("v")
    val out = Profile.histogramQuantiles(df, col("v"), pcts).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4)) ==
      ((2L, 5L, 9L, 10L, 10L)), out.toString)
  }

  test("property: matches the sorted-array rank formula sorted[ceil(p*N)-1]") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(257)(rnd.nextInt(40).toLong) // heavy duplication
    val out = Profile.histogramQuantiles(vals.toDF("v"), col("v"), pcts).collect().head
    val sorted = vals.sorted
    pcts.zipWithIndex.foreach { case ((_, pct), i) =>
      // type-1: smallest v whose cumulative count reaches ceil(p*N),
      // decided as 100*cum >= pct*N in integers
      val rank = (pct * vals.size + 99) / 100 // ceil(pct*N/100) in integers
      assert(out.getLong(i) == sorted(rank - 1), s"pct $pct")
    }
    assert(out.getLong(pcts.size) == vals.size.toLong)
  }

  test("grouped: per-group verdicts match the per-group sorted-array rank formula") {
    val rnd = new scala.util.Random(7)
    // deliberately skewed group sizes: g0 has 10x the rows of g2
    val rows = (0 until 500).map(i => ("g" + (if (i < 300) 0 else if (i < 450) 1 else 2),
      rnd.nextInt(25).toLong))
    val out = Profile.groupedHistogramQuantiles(rows.toDF("g", "v"), Seq("g"), col("v"), pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val r = out(g)
      pcts.zipWithIndex.foreach { case ((_, pct), i) =>
        val rank = (pct * sorted.size + 99) / 100
        assert(r.getLong(i + 1) == sorted(rank - 1), s"group $g pct $pct: $r")
      }
      assert(r.getLong(pcts.size + 1) == sorted.size.toLong, s"group $g n: $r")
    }
  }

  test("grouped scale shape: one group-keyed exchange chain, windows over the histogram only") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val q = Profile.groupedHistogramQuantiles(df, Seq("event_type"),
      expr("cast(floor(value * 100 + 0.5) as bigint)"), pcts)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count(1)"),
      s"histogram must map-side combine:\n${plan.take(2000)}")
    // cumulative rank must consume the AGGREGATED histogram — the
    // bounded-buffer guarantee: window partitions hold ≤ |cents
    // range| rows regardless of group size (and WindowExec spills)
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) >= 0,
      s"window must run over histogram rows:\n${plan.take(2000)}")
    assert(!plan.contains("percentile"), "no value-buffering percentile anywhere")
  }

  test("scale shape: histogram partial-aggregates before any exchange; window sees only the histogram") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Profile.histogramQuantiles(df,
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"), pcts)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count(1)"),
      s"histogram must map-side combine:\n${plan.take(2000)}")
    // the running sum must consume the AGGREGATED histogram, not raw
    // rows: the Window's child chain contains the final HashAggregate
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) >= 0,
      s"window must run over histogram rows:\n${plan.take(2000)}")
  }
}
