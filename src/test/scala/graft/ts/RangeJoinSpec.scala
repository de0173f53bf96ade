package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1, 100L, "a"), (1, 250L, "b"), (1, 900L, "c"),
    (2, 100L, "d"), (2, 2000L, "e")).toDF("k", "ts", "tag")
  private lazy val intervals = Seq(
    (1, 50L, 300L, "i1"), (1, 800L, 1000L, "i2"),
    (2, 0L, 150L, "i3"), (2, 5000L, 6000L, "i4")).toDF("k", "s", "e", "iv")

  test("rangeJoin equals the naive between-join") {
    val got = TimeOps.rangeJoin(points, "ts", intervals, "s", "e", Seq("k"), bucketWidth = 100L)
      .select("k", "ts", "tag", "iv").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val naive = points.join(intervals, Seq("k"))
      .where($"ts" >= $"s" && $"ts" <= $"e")
      .select("k", "ts", "tag", "iv").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == naive)
    assert(got == Set((1, 100L, "a", "i1"), (1, 250L, "b", "i1"), (1, 900L, "c", "i2"),
      (2, 100L, "d", "i3")), "point e matches no interval")
  }

  test("rangeJoin emits boundary points exactly once") {
    // point exactly on an interval edge AND a bucket edge
    val p = Seq((1, 200L, "edge")).toDF("k", "ts", "tag")
    val iv = Seq((1, 200L, 400L, "i")).toDF("k", "s", "e", "iv")
    val got = TimeOps.rangeJoin(p, "ts", iv, "s", "e", Seq("k"), bucketWidth = 100L).collect()
    assert(got.length == 1)
  }

  test("rangeJoin plans an equi shuffle join, not BroadcastNestedLoopJoin") {
    val plan = TimeOps.rangeJoin(points, "ts", intervals, "s", "e", Seq("k"), bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected an equi join:\n${plan.take(800)}")
  }
}
