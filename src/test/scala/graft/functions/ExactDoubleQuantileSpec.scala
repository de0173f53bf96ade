package graft.functions

import graft.SparkSpec
import graft.plans.KernelRuntime
import org.apache.spark.sql.functions._

/** Pins Profile.exactDoubleQuantiles — exact rank selection on
  * unbounded doubles via order-preserving IEEE bit keys + bounded
  * 2^16-radix narrowing — and the key map itself.
  */
class ExactDoubleQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(("q25", 25), ("q50", 50), ("q75", 75), ("q95", 95))

  test("bit map: strictly monotone over hostile doubles, and involutive") {
    val xs = Seq(Double.NegativeInfinity, -1.7e308, -3.5, -1e-300, -0.0,
      0.0, 4.9e-324, 1e-300, 2.5, 1.7e308, Double.PositiveInfinity)
    val keys = xs.map(KernelRuntime.sortableDoubleBits)
    assert(keys == keys.sorted, s"keys must ascend with numeric order: $keys")
    assert(keys.distinct.size == keys.size, "distinct doubles -> distinct keys (-0.0/0.0 adjacent)")
    xs.foreach { x =>
      val back = KernelRuntime.sortableBitsToDouble(KernelRuntime.sortableDoubleBits(x))
      assert(java.lang.Double.doubleToRawLongBits(back) ==
        java.lang.Double.doubleToRawLongBits(x), s"round trip $x")
    }
  }

  test("property: matches sorted[ceil(p*N/100)-1] on adversarial doubles") {
    val rnd = new scala.util.Random(1234)
    // negatives, duplicates, subnormals, huge magnitudes, exact zeros
    val vals = Seq.fill(3001)(rnd.nextInt(6) match {
      case 0 => -math.exp(rnd.nextDouble() * 200 - 100)
      case 1 => math.exp(rnd.nextDouble() * 200 - 100)
      case 2 => rnd.nextInt(10).toDouble // heavy duplication
      case 3 => -rnd.nextInt(10).toDouble
      case 4 => rnd.nextDouble() * 4.9e-300 // tiny
      case _ => 0.0
    })
    val out = Profile.exactDoubleQuantiles(vals.toDF("v"), col("v"), pcts).collect().head
    val sorted = vals.sorted
    pcts.zipWithIndex.foreach { case ((_, p), i) =>
      val rank = ((p.toLong * vals.size + 99) / 100).toInt
      assert(out.getDouble(i) == sorted(rank - 1),
        s"pct $p: ${out.getDouble(i)} vs ${sorted(rank - 1)}")
    }
    assert(out.getLong(pcts.size) == vals.size.toLong)
  }

  test("grouped: per-group verdicts match per-group sorted picks; group cap enforced") {
    val rnd = new scala.util.Random(77)
    val rows = (0 until 900).map(i =>
      ("g" + (i % 3), rnd.nextDouble() * 2000 - 1000))
    val out = Profile.exactDoubleQuantilesBy(rows.toDF("g", "v"), "g", col("v"), pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      pcts.zipWithIndex.foreach { case ((_, p), i) =>
        val rank = ((p.toLong * sorted.size + 99) / 100).toInt
        assert(out(g).getDouble(i + 1) == sorted(rank - 1), s"group $g pct $p")
      }
      assert(out(g).getLong(pcts.size + 1) == sorted.size.toLong)
    }
    val boom = intercept[IllegalArgumentException] {
      Profile.exactDoubleQuantilesBy(
        (0 until 50).map(i => (s"g$i", 1.0)).toDF("g", "v"), "g", col("v"),
        Seq(("q50", 50)), maxGroups = 10)
    }
    assert(boom.getMessage.contains("driver-bounded"), boom.getMessage)
  }

  test("nulls excluded; empty input yields null quantiles and n_rows 0") {
    val withNulls = (Seq[java.lang.Double](3.0, null, 1.0, 2.0, null))
      .toDF("v")
    val out = Profile.exactDoubleQuantiles(withNulls, col("v"), Seq(("q50", 50)))
      .collect().head
    assert(out.getDouble(0) == 2.0 && out.getLong(1) == 3L, out.toString)
    val empty = Profile.exactDoubleQuantiles(
      Seq.empty[Double].toDF("v"), col("v"), Seq(("q50", 50))).collect().head
    assert(empty.isNullAt(0) && empty.getLong(1) == 0L, empty.toString)
  }

  test("scale shape: per-round histograms partial-aggregate; collected state is bounded") {
    // the per-round aggregation must map-side combine (bucket cardinality
    // <= 65,536 per target — the whole point); pin partial_count in the
    // round-one plan built the same way the operator builds it
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val keyed = df.select(col("value").cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .select(graft.plans.SortableDoubleBits.of(col("__v"))
        .bitwiseXOR(lit(Long.MinValue)).as("__u"))
    val hist = keyed
      .select(shiftrightunsigned(col("__u"), 48).bitwiseAND(lit(0xFFFFL)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), s"histogram must map-side combine:\n${plan.take(1200)}")
    assert(hist.count() <= 65536L, "bucket cardinality bounded by construction")
  }
}
