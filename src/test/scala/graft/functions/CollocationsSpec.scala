package graft.functions

import graft.SparkSpec

/** Pins Collocations.pmiTopK — lift-ranked top-K bigram collocations. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed lifts: PMI ranking separates collocation from chance") {
    // corpus engineered so "x y" always co-occurs while "a b" is chance:
    // 6×"x y" + filler where a and b are frequent but never adjacent
    // to each other in a fixed pattern.
    //   doc1..6: "x y"          → c(xy)=6
    //   doc7:    "a c a c a c a c a c b c b c b c b c b c"
    val docs = ((1 to 6).map(i => (i.toLong, "x y")) :+
      (7L, "a c a c a c a c a c b c b c b c b c b c")).toDF("doc_id", "text")
    val out = Collocations.pmiTopK(docs, "text", minCount = 5L, topK = 10).collect()
    // unigrams: x=6, y=6, a=5, b=5, c=10 → N_bigrams = 6*1 + 19 = 25
    // surviving pairs (c12>=5): (x,y)=6, (a,c)=5, (c,a)=4 ✗, (c,b)=5, (b,c)=5
    // lifts: xy = 6*25/(6*6) = 4.1666…; ac = 5*25/(5*10) = 2.5;
    //        cb = 5*25/(10*5) = 2.5; bc = 5*25/(5*10) = 2.5
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("x", "y", 6L), ("a", "c", 5L), ("b", "c", 5L), ("c", "b", 5L)),
      out.mkString("; "))
    val top = out.head
    assert(top.getLong(3) == 6L && top.getLong(4) == 6L && top.getLong(5) == 25L)
    assert(top.getDouble(6) == 6.0 * 25.0 / (6.0 * 6.0))
    // ties (2.5) broken by (w1, w2) ascending — deterministic order
    assert(out(1).getDouble(6) == 2.5 && out(3).getDouble(6) == 2.5)
  }

  test("minCount filters chance pairs; short docs contribute nothing") {
    val docs = Seq((1L, "p q"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val out = Collocations.pmiTopK(docs, "text", minCount = 2L, topK = 10).collect()
    assert(out.isEmpty, s"c12=1 < minCount must yield no rows: ${out.mkString}")
    val all = Collocations.pmiTopK(docs, "text", minCount = 1L, topK = 10).collect()
    assert(all.length == 1 && all.head.getString(0) == "p")
  }

  test("skew-safe shape: partial-agg counts + top-K heap, no window, no global sort") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Collocations.pmiTopK(docs, "text").queryExecution.executedPlan.toString
    // Zipf-hot bigrams must collapse map-side: partial aggregation
    // before the exchange, never a count-only window on the pair key
    assert(!plan.contains("Window "), s"no window in the count path:\n${plan.take(2000)}")
    assert(plan.contains("partial_count(1)"), s"map-side combine required:\n${plan.take(2000)}")
    // final top-K must be per-partition heaps, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), s"top-K must be TakeOrdered:\n${plan.take(2000)}")
    // the unigram side rides a broadcast under the vocab gate
    assert(plan.contains("BroadcastHashJoin"), s"unigram join must broadcast:\n${plan.take(2000)}")
  }
}
