package graft.dedup

import graft.SparkSpec
import graft.ann.Ann
import org.apache.spark.sql.functions._

/** Pins Dedup.semanticDedup — SemDeDup-style within-cell cosine dedup. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated directions + near-duplicates of each; float
  // vectors as the embeddings table carries
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),          // cell rep A (also centroid seed)
    (1L, Array(0f, 1f, 0f, 0f)),          // cell rep B (also centroid seed)
    (2L, Array(0.99f, 0.14f, 0f, 0f)),    // near 0 → dup_of 0
    (3L, Array(0.98f, 0.19f, 0f, 0f)),    // near 0 and 2 → dup_of 0, n_near 2
    (4L, Array(0.1f, 0.99f, 0f, 0f)),     // near 1 → dup_of 1
    (5L, Array(0f, 0f, 1f, 0f)))          // orthogonal: assigned somewhere, no near-dups

  test("hand-built families: within-cell near-dups flag to the smallest id") {
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = Ann.ivfSeedCentroids(emb, "vec_id", "embedding", k = 2)
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", cents, threshold = 0.9)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 0L, 1L), (3L, 0L, 2L), (4L, 1L, 1L)), out.mkString("; "))
  }

  test("representatives and isolated vectors are never flagged") {
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = Ann.ivfSeedCentroids(emb, "vec_id", "embedding", k = 2)
    val flagged = Dedup.semanticDedup(emb, "vec_id", "embedding", cents, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(!flagged.contains(0L) && !flagged.contains(1L), "family minima survive")
    assert(!flagged.contains(5L), "orthogonal vector has no near-dups")
  }

  test("scale shape: kernel assignment (no centroid join), cell-keyed pair join, no window") {
    // parquet-backed: a literal LocalRelation lets ConvertToLocalRelation
    // fold the assignment kernel away before the physical plan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Ann.ivfSeedCentroids(emb, "vec_id", "embedding", k = 2)
    val plan = Dedup.semanticDedup(emb, "vec_id", "embedding", cents, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"no window anywhere:\n${plan.take(2000)}")
    assert(plan.toLowerCase.contains("nearestcentroid"),
      s"assignment must ride the zero-shuffle kernel:\n${plan.take(2000)}")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"keep-min verdict must partial-aggregate:\n${plan.take(2000)}")
  }
}
