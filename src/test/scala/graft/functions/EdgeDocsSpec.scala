package graft.functions

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Adversarial document rows the driver-generated corpus never
  * contains — empty, punctuation-only (normalizes to empty),
  * whitespace-only, single-char — pinned against the crashes and
  * phantom rows the r16 edge fixture surfaced (tools/
  * make_edge_fixture.py runs the full DuckDB gate on the same rows;
  * this spec is the fast Spark-side regression net).
  */
class EdgeDocsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, ""),              // empty
    (2L, "!!! ??? ... ;;;"), // punct-only → normalizes to ''
    (3L, "   \t  "),       // whitespace-only
    (4L, "a"),             // single 1-char token
    (5L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("qualityScore: empty/punct docs score without a divide-by-zero (ANSI)") {
    val out = docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // empty text: alphaRatio 0 (guarded), stopRatio 0, meanTokLen 0
    // → lenScore 0.5 → 0.15
    assert(out(1L) == 0.15, s"empty doc: ${out(1L)}")
    assert(out(3L) == 0.15, s"whitespace doc: ${out(3L)}")
    assert(out(5L) > 0.5, s"real sentence scores above the floor: ${out(5L)}")
  }

  test("tokens convention: empty and punct-only normalize to the one-empty-token ['']") {
    val t = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(t(1L) == Seq("") && t(2L) == Seq("") && t(3L) == Seq(""), t.toString)
    assert(t(4L) == Seq("a"))
  }

  test("sampleFrames: an empty payload yields ZERO frames, not a phantom md5('')") {
    // sequence(0, n−1) at n = 0 is Spark's DESCENDING [0, −1]; the
    // unguarded explode emitted frame_idx 0 with md5 of the empty
    // substring for every empty doc
    val frames = Multimodal.sampleFrames(docs, "doc_id", "text", frameChars = 4, every = 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!frames.contains(1L), s"empty doc must emit no frames: $frames")
    assert(frames(4L) == 1L && frames(5L) == 11L, frames.toString)
  }

  test("bpeEncodeCounts: empty docs get the 1-word/0-token convention, no crash") {
    val out = TokenizerStats.bpeEncodeCounts(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // empty/punct/ws docs: one empty token whose symbol list is empty
    for (id <- Seq(1L, 2L, 3L)) assert(byId(id) == ((1L, 0L)), s"doc $id: ${byId(id)}")
    assert(byId(4L) == ((1L, 1L)), s"single char: ${byId(4L)}")
  }
}
