package graft.functions

import graft.SparkSpec

/** Pins Profile.jsonPropsRollup — schema-on-read JSON sidecar rollup. */
class JsonRollupSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed rollup: extraction, bucketing, exact distinct, cents") {
    val ev = Seq(
      ("click", """{"k": 3}""", 1L, 1.01),    // bucket 0; cents 101
      ("click", """{"k": 7}""", 1L, 2.0),     // bucket 0; same user
      ("click", """{"k": 12}""", 2L, 0.004),  // bucket 1; cents 0
      ("view", """{"k": 99}""", 3L, 10.0),    // bucket 9
      ("view", """{"j": 1}""", 3L, 1.0)       // missing field → null k, null bucket
    ).toDF("event_type", "props", "user_id", "value")
    val out = Profile.jsonPropsRollup(ev, "event_type", "props", "k",
        "user_id", "value", bucketWidth = 10)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("click", 0L, 2L, 10L, 1L, 301L),
      ("click", 1L, 1L, 12L, 1L, 0L),
      ("view", -1L, 1L, -1L, 1L, 100L),
      ("view", 9L, 1L, 99L, 1L, 1000L)),
      out.mkString("; "))
  }

  test("plan shape: native json path over a pruned scan, partial agg, no UDF") {
    // parquet-backed (a literal LocalRelation constant-folds the whole
    // extraction away): pins BOTH the codegen'd path expression and
    // column pruning down to the four referenced columns
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = Profile.jsonPropsRollup(ev, "event_type", "props", "k",
      "user_id", "value", 10).queryExecution.executedPlan.toString
    assert(plan.contains("get_json_object"), s"native path expression required:\n${plan.take(1500)}")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"no UDF allowed:\n${plan.take(1500)}")
    assert(plan.contains("partial_count(1)"), s"map-side combine required:\n${plan.take(1500)}")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .map(_.split("ReadSchema: ").last).getOrElse("")
    assert(readSchema.contains("event_type") && readSchema.contains("props") &&
      !readSchema.contains("event_id") && !readSchema.contains("ts:"),
      s"scan must prune to the referenced columns: $readSchema")
  }
}
