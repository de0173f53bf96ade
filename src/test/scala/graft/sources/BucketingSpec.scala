package graft.sources

import graft.SparkSpec
import graft.ts.Featurize

/** Proof of the bucketing scale path: a series table written bucketed
  * by its key satisfies the window's distribution requirement on read,
  * so the featurize pipeline runs with ZERO shuffle — at 100 TB the
  * series exchange is paid once at ingest, not per pipeline.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("featurize over a bucketed table plans no shuffle exchange") {
    val df = (for (u <- 0 until 8; t <- 0 until 50) yield (u.toLong, t.toLong, u + t * 0.5))
      .toDF("user_id", "ts_us", "value")
    Sources.writeBucketed(df, "ev_bucketed", "user_id", nBuckets = 4, sortCol = Some("user_id"))
    try {
      val bucketed = spark.table("ev_bucketed")
      val feat = Featurize.lagFeatures(bucketed, Seq("value"), Seq("user_id"), Seq("ts_us"), Seq(1, 7))
      val plan = feat.df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed read should satisfy the window distribution:\n${plan.take(800)}")
      // and it still computes the right thing
      val r = feat.df.where($"user_id" === 3 && $"ts_us" === 10).select("value_lag1").head().getDouble(0)
      assert(r == 3 + 9 * 0.5)
    } finally spark.sql("drop table if exists ev_bucketed")
  }
}
