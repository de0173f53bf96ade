package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Profile.profile: value correctness, the per-column-class
  * distinct plan (floats → HLL sketch by default, bounded classes →
  * exact distributed Expand+dedup), and the override knob.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed profile row: counts, nulls, moments, exact distinct") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (2L, "b"), (null, "c"))
      .toDF("k", "s")
    val out = Profile.profile(df, Seq("k")).collect().head
    assert(out.getString(0) == "k" && out.getLong(1) == 4L && out.getLong(2) == 1L)
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == 2.0)
    assert(out.getDouble(5) == 1.6667, s"mean: $out")
    assert(out.getLong(7) == 2L, "exact distinct over the bigint column")
  }

  test("class rule: a double column profiles via approx_count_distinct (HLL), no Expand") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id", "value")
    val plan = Profile.profile(ev, Seq("value")).queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"),
      s"unbounded double must ride the sketch:\n${plan.take(1500)}")
    assert(!plan.contains("(distinct ") && !plan.contains("Expand"),
      s"no exact-distinct machinery for the sketch class:\n${plan.take(1500)}")
  }

  test("class rule: bigint stays exact (Expand+dedup); the override opts a double into exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id", "value")
    // Spark's two-phase exact distinct shows as partial_count(distinct …)
    // over a value-keyed dedup aggregate (Expand only appears when
    // several distinct groups mix) — pin the distinct machinery itself
    val exact = Profile.profile(ev, Seq("user_id")).queryExecution.executedPlan.toString
    assert(exact.contains("(distinct ") && !exact.contains("approx_count_distinct"),
      s"bounded class must count exactly:\n${exact.take(1500)}")
    val overridden = Profile.profile(ev, Seq("value"), exactDistinctCols = Set("value"))
      .queryExecution.executedPlan.toString
    assert(overridden.contains("(distinct ") && !overridden.contains("approx_count_distinct"),
      s"override must restore the exact shape:\n${overridden.take(1500)}")
  }

  test("sketch accuracy: approx distinct of a wide double column lands within the rsd band") {
    val n = 20000
    val df = (1 to n).map(i => i * 1.000001).toDF("v")
    val approx = Profile.profile(df, Seq("v")).collect().head.getLong(7)
    assert(math.abs(approx - n.toDouble) / n < 0.15,
      s"HLL at rsd 0.05 should land near $n, got $approx")
  }
}
