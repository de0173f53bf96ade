package graft.dedup

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 0
    (3L, "completely different content about spark window functions and shuffles here"),
    (4L, "Thé QUICK   brown fox... jumps over the lazy dog again and again today!") // normalizes near 0
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps smallest id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect()
    val dupOf = out.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    // doc 1 dups doc 0; doc 4 normalizes differently ("th quick" due to é) → own group
    assert(dupOf(0).isEmpty && dupOf(1).contains(0L) && dupOf(3).isEmpty)
  }

  test("minhash LSH finds the near-duplicate pair and not the distinct doc") {
    val out = Dedup.minhashDupOf(docs, "doc_id", "text").orderBy("doc_id").collect()
    val dupOf = out.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(dupOf(1).contains(0L), "exact dup must band together")
    assert(dupOf(2).contains(0L) || dupOf(2).contains(1L), "near dup should band together")
    assert(dupOf(3).isEmpty, "distinct doc must not match")
  }

  test("ngram jaccard: exact dup scores 1.0, distinct pair absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash of identical docs is identical; hamming small for near dups") {
    val sig = docs.select(TextOps.simhash32(TextOps.tokens($"text")).as("s")).collect().map(_.getLong(0))
    assert(sig(0) == sig(1))
    assert(java.lang.Long.bitCount(sig(0) ^ sig(2)) <= 8)
    assert(java.lang.Long.bitCount(sig(0) ^ sig(3)) > 4)
  }

  test("langid picks english for english text") {
    val lang = docs.select(TextOps.langid(TextOps.tokens($"text"))).head().getString(0)
    assert(lang == "en")
  }
}
