package graft.functions

import graft.SparkSpec

/** Pins TokenizerStats.topPairs — the distributed BPE merge-candidate
  * scan. */
class TokenizerStatsSpec extends SparkSpec {
  import spark.implicits._

  test("counts and deterministic ordering on a closed-form corpus") {
    // pairs: (a,b)x3  (b,a)x1  (b,c)x2  (c,b)x1
    val docs = Seq((1L, "a b a b"), (2L, "a b c b c")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 3L), ("b", "c", 2L), ("b", "a", 1L)))
  }

  test("ties at the cut break on the pair, not partition order") {
    // every pair occurs exactly once → order is purely lexicographic
    val docs = Seq((1L, "d c"), (2L, "b a"), (3L, "a z"), (4L, "c q")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "z"), ("b", "a")))
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TokenizerStats.topPairs(docs, "text").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n${plan.take(1200)}")
  }

  test("short docs contribute nothing and break nothing") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val out = TokenizerStats.topPairs(docs, "text").collect()
    // "" normalizes to [""] (1 token, no pairs); "solo" has no pairs
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("x", "y", 1L)))
  }
}
