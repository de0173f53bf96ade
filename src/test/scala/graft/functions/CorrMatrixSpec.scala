package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(5)
    (0 until 500).map { i =>
      val x = rnd.nextDouble() * 10
      (x, 2.0 * x + 1.0, -3.0 * x, rnd.nextDouble())
    }.toDF("x", "y2x", "negx", "noise")
  }

  test("perfect linear relations hit ±1, noise stays near 0") {
    val out = Profile.correlationMatrix(df, Seq("x", "y2x", "negx", "noise"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "y2x")) == 1.0, out.toString)
    assert(out(("x", "negx")) == -1.0, out.toString)
    assert(math.abs(out(("x", "noise"))) < 0.15, out.toString)
    assert(out.size == 6, "4 columns -> 6 pairs")
  }

  test("correlation matrix plans ONE exchange (single aggregation pass)") {
    val plan = Profile.correlationMatrix(df, Seq("x", "y2x", "noise"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n${plan.take(800)}")
    assert(plan.contains("partial_"), "partial aggregation must run map-side")
  }

  test("null rows are excluded listwise: every pair shares one n") {
    val withNulls = df.withColumn("y2x",
      when(col("x") > 9.0, lit(null).cast("double")).otherwise(col("y2x")))
    val out = Profile.correlationMatrix(withNulls, Seq("x", "y2x", "noise"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "y2x")) == 1.0, s"nulls must not break the exact relation: $out")
  }
}
