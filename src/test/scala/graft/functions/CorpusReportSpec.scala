package graft.functions

import graft.SparkSpec

/** Profile.corpusReport — the per-(source, lang) corpus report card. */
class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  // two sources × two langs; docs 1 and 3 are exact duplicates (same
  // normalized text) across different cells — each cell counts its own
  // members, the dup verdict is corpus-wide (min doc_id wins)
  private lazy val docs = Seq(
    (1L, "the quick brown fox", "web", "en"),
    (2L, "one two three", "web", "en"),
    (3L, "The quick  BROWN fox!", "book", "en"),
    (4L, "uno dos", "book", "es"),
    (5L, "uno dos tres cuatro cinco", "web", "es")
  ).toDF("doc_id", "text", "source", "lang")

  test("counts, token totals, and the corpus-wide dup verdict per cell") {
    val out = Profile.corpusReport(docs, "doc_id", "text", Seq("source", "lang"))
      .orderBy("source", "lang")
      .select("source", "lang", "n_docs", "n_dup_docs", "total_tokens", "min_tokens", "max_tokens")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      // doc 3 normalizes to doc 1's text → the book/en cell carries the dup
      ("book", "en", 1L, 1L, 4L, 4L, 4L),
      ("book", "es", 1L, 0L, 2L, 2L, 2L),
      ("web", "en", 2L, 0L, 7L, 3L, 4L),
      ("web", "es", 1L, 0L, 5L, 5L, 5L)))
  }

  test("quality rollup is exact integer arithmetic on the s4 scale") {
    val out = Profile.corpusReport(docs, "doc_id", "text", Seq("lang"))
      .orderBy("lang")
      .select("lang", "n_docs", "sum_quality_s4", "min_quality_s4", "max_quality_s4")
      .as[(String, Long, Long, Long, Long)].collect()
    out.foreach { case (_, n, sumQ, minQ, maxQ) =>
      assert(minQ <= maxQ && sumQ >= n * minQ && sumQ <= n * maxQ)
      assert(minQ >= 0 && maxQ <= 10000)
    }
  }

  test("plan: dup verdict is a partial-agg groupBy + join, never a digest window") {
    val plan = Profile.corpusReport(docs, "doc_id", "text", Seq("source", "lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window over the content hash:\n${plan.take(1200)}")
    assert(plan.contains("partial_min("),
      s"group min must partial-aggregate before the exchange:\n${plan.take(1500)}")
  }

  test("corpusFunnel: staged counts are monotone and tokens come only from final survivors") {
    val out = Profile.corpusFunnel(docs, "doc_id", "text")
      .select("lang_pred", "docs_in", "docs_dedup", "docs_final", "tokens_final")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == 5, "every doc lands in exactly one language cell")
    out.foreach { case (_, in, dd, fin, toks) =>
      assert(in >= dd && dd >= fin && fin >= 0, "funnel stages are monotone")
      assert(fin > 0 || toks == 0, "no tokens without final survivors")
    }
    // exactly one of docs 1/3 (exact normalized dups) survives dedup
    val totalDedup = out.map(_._3).sum
    assert(totalDedup == 4, s"5 docs, one exact-dup pair -> 4 dedup survivors, got $totalDedup")
  }

  test("corpusFunnel plan: no content-hash window; one scoring scan feeds the rollup") {
    val plan = Profile.corpusFunnel(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n${plan.take(1200)}")
    assert(plan.contains("partial_min("), plan.take(1500))
  }
}
