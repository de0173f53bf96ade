package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins LmScore.score — corpus-trained add-one-smoothed bigram LM
  * scoring with exact integer e9-scaled probabilities.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed corpus: counts, smoothing, and scaling are exact") {
    // corpus: "a b a b" and "a b". tokens: a,b,a,b,a,b → c(a)=3, c(b)=3
    // vocab V = 2. bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b)
    // c(ab)=3, c(ba)=1
    // P(b|a) = (3+1)/(3+2) = 0.8 → pe9 = 800000000
    // P(a|b) = (1+1)/(3+2) = 0.4 → pe9 = 400000000
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 2000000000L, 2000000000.0 / (3.0 * 1.0e9))))
    assert(out(2L) == ((1L, 800000000L, 0.8)))
  }

  test("short and empty docs survive with zero bigrams and null mean") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val rows = LmScore.score(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 0L && rows(1L).getLong(2) == 0L && rows(1L).isNullAt(3))
    assert(rows(2L).getLong(1) == 0L)
    assert(rows(3L).getLong(1) == 1L)
  }

  test("gibberish scores below repeated natural text") {
    val natural = (1 to 20).map(_ => "the cat sat on the mat").mkString(" ")
    val docs = (0L until 20L).map(i => (i, natural)) :+
      (99L, "zq xv jk wp qg lm bz kx vj pw gq ml")
    val out = LmScore.score(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out(0L) > out(99L),
      s"repeated natural text ${out(0L)} must outscore gibberish ${out(99L)}")
  }

  test("skew-safe shape: partial-agg groupBys + join back, never a window on the bare pair") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = LmScore.score(docs, "doc_id", "text").queryExecution.executedPlan.toString
    // Zipfian bigram frequency through a count-only window is the
    // 100TB straggler (WindowExec partitions cannot be AQE-split)
    assert(!plan.contains("Window "), s"no window allowed in the frequency path:\n${plan.take(2000)}")
    assert(plan.contains("partial_count(1)"),
      s"per-(doc,bigram) multiplicity must partial-aggregate before its exchange:\n${plan.take(2000)}")
    assert(plan.contains("partial_sum(__ndb"),
      s"corpus bigram counts must partial-aggregate the per-doc counts:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(__w1"),
      s"frequency exchange must key on the pair:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"), s"small vocab must broadcast:\n${plan.take(2000)}")
  }

  test("hot-key corpus: one Zipf-dominant bigram stays value-correct") {
    // "of the" dominates the pair distribution — the expected case at
    // corpus scale, which the two-stage shape must count correctly
    val hot = (1 to 30).map(_ => "of the").mkString(" ")
    val docs = ((1L to 10L).map(i => (i, hot)) :+ (99L, "rare words only")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // each hot doc: 60 tokens -> 59 bigrams; c(of,the)=300, c(the,of)=290
    // vocab {of,the,rare,words,only} -> V=5; c(of)=c(the)=300
    assert(out(1L)._1 == 59L)
    val pOfThe = math.floor((300.0 + 1) / (300 + 5) * 1e9).toLong
    val pTheOf = math.floor((290.0 + 1) / (300 + 5) * 1e9).toLong
    assert(out(1L)._2 == 30L * pOfThe + 29L * pTheOf,
      s"expected ${30L * pOfThe + 29L * pTheOf}, got ${out(1L)._2}")
    assert((1L to 10L).forall(i => out(i) == out(1L)))
  }
}
