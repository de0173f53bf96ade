package graft.dedup

import graft.SparkSpec

/** Plan regression guards for the dedup family's scale shape —
  * specifically the failure mode where a filter or self-join
  * re-evaluates the expensive signature pipeline (observed 2× cost when
  * lshBands' null filter was substituted through the projection and
  * pushed to the scan).
  */
class DedupPlanSpec extends SparkSpec {
  import spark.implicits._

  // spark.range (not a LocalRelation): ConvertToLocalRelation would
  // constant-fold the whole signature pipeline out of the plan
  private lazy val docs = spark.range(50)
    .select(org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.lit("alpha beta gamma delta epsilon"),
        org.apache.spark.sql.functions.col("id").cast("string")).as("text"))

  test("minhashDupOf evaluates the signature pipeline exactly once (no filter re-evaluation)") {
    val plan = Dedup.minhashDupOf(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert("minhashperms".r.findAllIn(plan.toLowerCase).length == 1,
      "minhash signature expression must appear exactly once in the plan")
    assert("shinglehash60".r.findAllIn(plan.toLowerCase).length == 1,
      "shingle hashing must appear exactly once in the plan")
  }

  test("exact dedup: group stats via partial-agg groupBy + join back, never a digest window") {
    val plan = Dedup.exact(docs, "doc_id", "text").queryExecution.executedPlan.toString
    // a window over the digest puts a 10⁹-duplicate page's whole group
    // in one unsplittable partition; the groupBy collapses it map-side
    assert(!plan.contains("Window "), s"no window over the digest:\n${plan.take(1500)}")
    assert(plan.contains("partial_count(1)") && plan.contains("partial_min("),
      s"group stats must partial-aggregate before the exchange:\n${plan.take(1500)}")
  }

  test("bucketed embedding pairs evaluate the bucket scan once (no self-join)") {
    import org.apache.spark.sql.functions._
    val embs = spark.range(40)
      .select(col("id").as("vec_id"),
        array((0 until 8).map(j => pmod(col("id") * j, lit(7)).cast("float")): _*).as("embedding"))
    val planes = graft.functions.VectorOps.lshPlanes(4, 8)
    val plan = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.5,
      bucketed = true, planes = planes).queryExecution.executedPlan.toString
    // one scan of the embeddings source, not two join branches
    val scans = "(?m)Range \\(".r.findAllIn(plan).length
    assert(scans == 1, s"expected one source scan, got $scans:\n${plan.take(800)}")
  }
}
