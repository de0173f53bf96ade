package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("sampleByHash is deterministic, order-independent, and ≈fraction sized") {
    val a = Sampling.sampleByHash(ids, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids.repartition(7).orderBy(rand(1)), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "per-row fate must not depend on layout")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"got ${a.size}/2000")
  }

  test("split partitions every row exactly once with ≈requested fractions") {
    val s = Sampling.split(ids, "id", 0.7, 0.15)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") / 2000.0 - 0.70) < 0.05, counts.toString)
    assert(math.abs(counts("valid") / 2000.0 - 0.15) < 0.03, counts.toString)
    // sample then split compose: the split of a sample keeps the fate
    // of shared rows (both are functions of the same hash)
    val sampled = Sampling.split(Sampling.sampleByHash(ids, "id", 0.8), "id", 0.7, 0.15)
    val full = s.select("id", "split").as[(Long, String)].collect().toMap
    sampled.select("id", "split").as[(Long, String)].collect().foreach { case (id, sp) =>
      assert(full(id) == sp)
    }
  }

  test("sampling plans a map-only scan: no exchange") {
    val plan = Sampling.sampleByHash(ids, "id", 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("stratifiedSample draws exactly n per stratum, layout-independent") {
    val strat = ids.withColumn("g", (col("id") % 4).cast("string"))
    val a = Sampling.stratifiedSample(strat, "g", "id", n = 10)
      .select("g", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    assert(a.size == 40, s"4 strata × 10, got ${a.size}")
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    val b = Sampling.stratifiedSample(strat.repartition(7).orderBy(rand(3)), "g", "id", n = 10)
      .select("g", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    assert(a == b, "the drawn set (and ranks) must not depend on layout")
  }

  test("stratifiedSample keeps the rank-limit pushdown (WindowGroupLimit)") {
    val strat = ids.withColumn("g", (col("id") % 4).cast("string"))
    val plan = Sampling.stratifiedSample(strat, "g", "id", n = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"lost WindowGroupLimit:\n${plan.take(1200)}")
  }
}
