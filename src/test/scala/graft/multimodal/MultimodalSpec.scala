package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 300),
    (2L, "hello multimodal world"),
    (3L, "b" * 130))
    .toDF("doc_id", "text")

  test("withBinary + fakeMeta: deterministic typed metadata from payload bytes") {
    val withBin = Multimodal.withBinary(docs, "text")
    val (n, w, h, f) = Multimodal.fakeMeta(col("payload"))
    val rows = withBin.select(col("doc_id"), n.as("n"), w.as("w"), h.as("h"), f.as("f"))
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == 300)
    assert(rows.forall(r => r.getLong(2) >= 16 && r.getLong(2) < 16 + 1024))
    assert(rows.forall(r => r.getLong(4) == 1), "sub-4KiB payloads are one frame")
    // determinism: same payload → same fake dims
    val again = withBin.select(w.as("w")).orderBy("doc_id").collect().map(_.getLong(0))
    assert(again.toSeq == rows.map(_.getLong(2)).toSeq)
  }

  test("decodeStub: batched per-partition decode emits one feature row per payload") {
    val withBin = Multimodal.withBinary(docs, "text")
    val out = Multimodal.decodeStub(withBin, "doc_id", "payload", batchSize = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(1) == 300)
    val feat = out(1).getSeq[Float](2)
    assert(feat.length == 4 && feat.exists(_ != 0f))
  }

  test("sampleFrames: every-2nd fixed-width frame with md5 payloads") {
    val out = Multimodal.sampleFrames(docs, "doc_id", "text", frameChars = 128, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // doc 1: 300 chars → 3 frames → sampled 0,2 ; doc 2: 1 frame → 0 ; doc 3: 2 frames → 0
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 2L), (2L, 0L), (3L, 0L)))
    assert(out.forall(_.getString(2).length == 32))
  }
}
