package graft.dedup

import graft.SparkSpec

/** Line-level (CCNet-style) dedup stats: hand-built corpus with known
  * boilerplate, the distinct-docs requirement, and the byte-semantics
  * eligibility contract (octet_length, not "characters" — engines
  * disagree on combining sequences; the real-corpus twin caught
  * exactly that divergence before this pin existed).
  */
class LineDedupSpec extends SparkSpec {

  private val boiler = "LICENSE: do what thou wilt"

  test("duplicated lines are counted per doc; ratio and kept bytes are exact") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, s"$boiler\nunique first line one\n\nok"), // blank + short 'ok' ineligible
      (2L, s"$boiler\nanother unique line here"),
      (3L, "totally original document text")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 4L, "n_lines counts every split segment incl. blank")
    assert(r1.getLong(2) == 2L, "eligible = the two >= 8-byte lines")
    assert(r1.getLong(3) == 1L, "one duplicated line")
    // kept: all lines except the boilerplate one
    assert(r1.getLong(4) == ("unique first line one".length + 0 + "ok".length).toLong)
    assert(r1.getDouble(5) == 0.5)
    val r3 = out(2)
    assert(r3.getLong(3) == 0L && r3.getDouble(5) == 0.0)
  }

  test("a line repeated only WITHIN one doc is not boilerplate (distinct docs >= 2)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "same internal line\nsame internal line"),
      (2L, "something entirely different here")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L, "intra-doc repetition alone is not a cross-doc dup")
  }

  test("eligibility is BYTE length: a multibyte 4-char line over 8 bytes is eligible") {
    val s = spark
    import s.implicits._
    // four 3-byte CJK chars = 12 bytes, 4 characters
    val cjk = "一丁丂七"
    val docs = Seq(
      (1L, s"$cjk\nfiller text beyond eight"),
      (2L, s"$cjk\nother filler text beyond")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 2L, "the 12-byte CJK line is eligible")
    assert(out(0).getLong(3) == 1L, "and it is the shared boilerplate")
  }

  test("trim decides identity: leading/trailing spaces do not break the match") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, s"   $boiler   \npadding line number one"),
      (2L, s"$boiler\npadding line number two")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 1L && out(1).getLong(3) == 1L)
    // kept_bytes counts the RAW line bytes of survivors only
    assert(out(0).getLong(4) == "padding line number one".length.toLong)
  }

  test("empty eligibility yields a null ratio, not a division artifact") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a\nb\nc")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").collect()
    assert(out(0).getLong(2) == 0L && out(0).isNullAt(5))
  }
}
