package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Compress.compressionStats — the deflate-ratio curation signal.
  * This op has no SQL oracle (deflate is not SQL-expressible), so this
  * spec IS the semantic gate.
  */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spam " * 400),                                    // boilerplate
    (2L, (1 to 400).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")), // diverse
    (3L, ""),
    (4L, "short")).toDF("doc_id", "text")

  test("repetitive text compresses far below diverse text; edges hold") {
    val out = Compress.compressionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    val (rawSpam, defSpam, ratioSpam) = out(1L)
    val (rawDiv, _, ratioDiv) = out(2L)
    assert(rawSpam == 2000L && rawDiv > 2000L)
    assert(ratioSpam < 0.05, s"boilerplate must crush: $ratioSpam")
    assert(ratioDiv > 3 * ratioSpam, s"diverse $ratioDiv vs spam $ratioSpam")
    assert(defSpam > 0)
    // empty doc: zero bytes, null ratio (no divide-by-zero garbage)
    assert(out(3L)._1 == 0L && out(3L)._3 == -1.0)
    assert(out(4L)._3 > 0.0)
  }

  test("deterministic across runs and map-only in the plan") {
    val a = Compress.compressionStats(docs, "doc_id", "text").collect().map(_.toSeq).toSeq
    val b = Compress.compressionStats(docs, "doc_id", "text").collect().map(_.toSeq).toSeq
    assert(a == b, "fixed-level deflate must be reproducible")
    val plan = Compress.compressionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be map-only:\n${plan.take(800)}")
  }
}
