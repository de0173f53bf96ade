package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RewriteRangeJoin — the opt-in bucketed rewrite of bare
  * point-in-interval joins.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val ConfKey = "spark.graft.rangeJoin.bucketMicros"

  private lazy val points = Seq(
    ("u1", 100L, 1L), ("u1", 250L, 2L), ("u1", 300L, 3L), ("u1", 999L, 4L),
    ("u2", 100L, 5L), ("u3", 500L, 6L))
    .toDF("user_id", "ts", "pid")

  private lazy val intervals = Seq(
    ("u1", 100L, 300L, "a"),   // hits 1, 2, 3 (both boundaries inclusive)
    ("u1", 400L, 450L, "b"),   // no hits
    ("u2", 90L, 110L, "c"),    // hits 5
    ("u2", 500L, 400L, "d"),   // INVALID (s > e): must match nothing, not crash sequence()
    ("u4", 0L, 1000L, "e"))    // key with no points
    .toDF("user_id", "s", "e", "label")

  private def keyed = points.join(intervals,
    points("user_id") === intervals("user_id") &&
      points("ts") >= intervals("s") && points("ts") <= intervals("e"))
    .select(points("user_id"), col("pid"), col("label"))

  // no key equality: the shape Spark can only nested-loop
  private def bare = points.join(intervals.drop("user_id"),
    points("ts") >= col("s") && points("ts") <= col("e"))
    .select(col("pid"), col("label"))

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("__graft_rj")

  private def withRule[T](width: Long)(body: => T): T = {
    val rule = RewriteRangeJoin(() =>
      spark.conf.getOption(ConfKey).flatMap(v => scala.util.Try(v.toLong).toOption))
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    spark.conf.set(ConfKey, width.toString)
    try body
    finally {
      spark.conf.unset(ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("without the rule, a pure range join is a nested-loop plan") {
    val plan = bare.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected the nested-loop baseline:\n${plan.take(800)}")
    assert(!rewritten(bare))
  }

  test("pure range join: the rule replaces the nested loop with an equi-join, same rows") {
    val expect = bare.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    withRule(50L) {
      val df = bare
      assert(rewritten(df))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule must remove the nested loop:\n${plan.take(1500)}")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expect)
    }
  }

  test("keyed range join: rewrite adds the bucket to the join key, rows unchanged") {
    val expect = keyed.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(expect == Set(("u1", 1L, "a"), ("u1", 2L, "a"), ("u1", 3L, "a"), ("u2", 5L, "c")))
    withRule(100L) {
      val df = keyed
      assert(rewritten(df), "keyed range joins rewrite too (finer partitioning under hot keys)")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(got == expect)
    }
  }

  test("strict inequalities keep their strictness through the rewrite") {
    def strict = points.join(intervals,
      points("user_id") === intervals("user_id") &&
        points("ts") > intervals("s") && points("ts") < intervals("e"))
      .select(col("pid"), col("label"))
    val expect = strict.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expect == Set((2L, "a"), (5L, "c"))) // boundary rows 1, 3 excluded
    withRule(100L) {
      assert(rewritten(strict))
      val got = strict.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expect)
    }
  }

  test("rewrite equivalence holds across bucket widths (1, 7, 10000)") {
    val expect = keyed.collect().map(r => (r.getLong(1), r.getString(2))).toSet
    for (w <- Seq(1L, 7L, 10000L)) {
      withRule(w) {
        val got = keyed.collect().map(r => (r.getLong(1), r.getString(2))).toSet
        assert(got == expect, s"width $w")
      }
    }
  }

  test("out-of-scope shapes are left alone: left joins, one-sided bands, unset conf") {
    withRule(100L) {
      val lj = points.join(intervals,
        points("user_id") === intervals("user_id") &&
          points("ts") >= intervals("s") && points("ts") <= intervals("e"), "left")
      assert(!rewritten(lj), "only INNER joins rewrite")
      val oneSided = points.join(intervals.drop("user_id"), points("ts") >= col("s"))
      assert(!rewritten(oneSided), "a lower bound alone is not an interval")
    }
    // conf unset → rule inert even when registered
    val rule = RewriteRangeJoin(() => None)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try assert(!rewritten(bare))
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq rule)
  }
}
