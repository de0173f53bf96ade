package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 12
  private lazy val docs = (0 until 200)
    .map(i => (i.toLong, s"document number $i with some distinguishing content $i"))
    .toDF("doc_id", "text")

  test("bloom membership: no false negatives, few false positives") {
    val ref = docs.where(col("doc_id") < 50)
    val bits = Dedup.bloomBuild(ref, "text", m = M, k = 3)
    val out = Dedup.bloomProbe(docs, "doc_id", "text", bits, m = M, k = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    (0L until 50L).foreach(i => assert(out(i), s"ref doc $i must hit (no false negatives)"))
    val fp = (50L until 200L).count(out(_))
    // 150 salted insertions in 4096 bits → per-probe fp ≈ (150/4096)^3 ≈ 5e-5
    assert(fp <= 2, s"false-positive count $fp is far above the expected Bloom rate")
  }

  test("bloom probe is a join-free map-only scan") {
    val bits = Dedup.bloomBuild(docs.limit(10), "text", m = M, k = 3)
    val plan = Dedup.bloomProbe(docs, "doc_id", "text", bits, m = M, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"probe must not shuffle or join:\n${plan.take(800)}")
  }

  test("build validates shape") {
    intercept[IllegalArgumentException] {
      Dedup.bloomBuild(docs, "text", m = 1000, k = 3) // not a power of two
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomProbe(docs, "doc_id", "text", new Array[Long](3), m = M, k = 3)
    }
  }
}
