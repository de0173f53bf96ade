package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: term i appears ~ N/i times — 120 distinct terms so
  // a capacity-16 summary genuinely evicts on every partition
  private lazy val zipfDocs = {
    val words = (1 to 120).flatMap(i => Seq.fill(1200 / i)(s"w$i"))
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(words)
    shuffled.grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(4)
  }

  test("misra-gries survivors are a bounded candidate set that still covers the heavy hitters") {
    val terms = zipfDocs.select(explode(TextOps.tokens(col("text"))).as("term"))
    val cands = Sketch.misraGriesCandidates(terms, "term", capacity = 16).distinct().as[String].collect().toSet
    assert(cands.size <= 16 * 4, s"candidates must be ≤ capacity × partitions, got ${cands.size}")
    assert(cands.size < 120, "the summary must actually evict on this corpus")
    // the undisputed heavy hitters survive every reasonable split
    assert(Set("w1", "w2", "w3").subsetOf(cands), s"top terms missing from $cands")
  }

  test("sketched top-k equals the exact full-shuffle top-k under eviction") {
    val exact = zipfDocs.select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketched = Sketch.topTermsSketched(zipfDocs, "text", k = 5, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketched == exact, s"sketched $sketched != exact $exact")
  }

  test("recount counts are exact, not sketch estimates") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = Sketch.topTermsSketched(docs, "text", k = 3, capacity = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // capacity 2 over 3 distinct terms: whatever survives must carry its
    // TRUE count from the recount pass
    out.foreach { case (t, n) =>
      val truth = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)(t)
      assert(n == truth, s"term $t: recount $n != true $truth")
    }
    assert(out.contains("a"), "the majority term always survives misra-gries")
  }
}
