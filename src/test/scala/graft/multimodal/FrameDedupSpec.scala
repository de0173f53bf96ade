package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Multimodal.frameDupStats — cross-document frame-level dedup. */
class FrameDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shared frames count across docs; within-doc repeats alone do not") {
    // frameChars = 4: doc 1 = AAAABBBB, doc 2 = AAAACCCC (shares AAAA),
    // doc 3 = DDDDDDDD (its two frames are both DDDD — a within-doc
    // repeat, shared with NO other doc), doc 4 = EEEEFFFF (unique)
    val docs = Seq(
      (1L, "AAAABBBB"), (2L, "AAAACCCC"), (3L, "DDDDDDDD"), (4L, "EEEEFFFF"))
      .toDF("doc_id", "text")
    val out = Multimodal.frameDupStats(docs, "doc_id", "text", frameChars = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)), out(1L).toString)
    assert(out(2L) == ((2L, 1L, 0.5)), out(2L).toString)
    assert(out(3L) == ((2L, 0L, 0.0)), s"within-doc repeat must NOT count: ${out(3L)}")
    assert(out(4L) == ((2L, 0L, 0.0)), out(4L).toString)
  }

  test("scale shape: distinct+partial-agg frequency, no window, hash-only shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Multimodal.frameDupStats(docs, "doc_id", "text", frameChars = 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"no window:\n${plan.take(1500)}")
    assert(plan.contains("partial_count"), s"frequency must map-side combine:\n${plan.take(1500)}")
    // the join carries only ids and hashes — the text column must not
    // survive past the frame projection
    val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("ShuffledHashJoin") max plan.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, "expected a join in the plan")
  }
}
