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
