package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateClusters closes transitive chains into one family") {
    // A ≈ B (share most shingles), B ≈ C, but A and C share fewer —
    // a chain that per-bucket anchoring cannot fully merge. Long docs
    // with single-word edits keep per-band collision odds high; the
    // minhash params are fixed, so the outcome is deterministic.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = base.replace("w5 ", "x5 ")
    val c = b.replace("w25 ", "x25 ")
    val docs = Seq(
      (0L, base), (1L, b), (2L, c),
      (10L, "completely unrelated content about spark query engines and columnar execution plans"),
      (11L, "completely unrelated content about spark query engines and columnar execution plans"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L && out(1L) == 0L,
      s"near-dup chain head must label to the minimum: $out")
    assert(out(2L) == out(1L), s"transitive member must join the family: $out")
    assert(out(10L) == 10L && out(11L) == 10L, s"exact dups cluster; unrelated stay apart: $out")
  }

  test("duplicateClusters labels singletons with their own id") {
    val docs = (0 until 8)
      .map(i => (i.toLong, s"unique document $i " + ("filler" + i + " ") * 10))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, lab) => assert(id == lab, s"singleton $id labeled $lab") }
  }
}
