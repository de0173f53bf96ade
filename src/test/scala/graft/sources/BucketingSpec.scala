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

  test("join of two tables bucketed on the join key plans ZERO exchange") {
    // the co-located join: both sides pre-shuffled on disk with the
    // same key and bucket count → SortMergeJoin reads each bucket pair
    // directly. At 100 TB this is THE way a fact-fact join avoids
    // shuffling either side.
    val facts = (0L until 400L).map(i => (i % 40, i, i * 1.5)).toDF("user_id", "event_id", "amount")
    val dims = (0L until 40L).map(u => (u, s"user$u")).toDF("user_id", "name")
    Sources.writeBucketed(facts, "facts_b", "user_id", nBuckets = 4, sortCol = Some("user_id"))
    Sources.writeBucketed(dims, "dims_b", "user_id", nBuckets = 4, sortCol = Some("user_id"))
    try {
      // disable broadcast so the small side doesn't sidestep the test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("facts_b").join(spark.table("dims_b"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n${plan.take(1000)}")
      assert(plan.contains("SortMergeJoin"), "expected the co-located sort-merge join")
      assert(j.count() == 400L)
      val one = j.where($"event_id" === 41L).select("name").head().getString(0)
      assert(one == "user1")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("drop table if exists facts_b")
      spark.sql("drop table if exists dims_b")
    }
  }
}
