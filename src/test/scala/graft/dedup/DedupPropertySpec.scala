package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Planted-duplicate properties that hold by construction:
  * identical texts produce identical signatures and land in identical
  * buckets, so EVERY dedup path must resolve them to the smallest id —
  * regardless of banding luck. Near-dup recall is probabilistic; exact
  * recall is not.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new Random(5)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def doc() = Seq.fill(20 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")
    val uniques = (0 until 60).map(i => (i.toLong, doc()))
    // plant duplicates: ids 100+i duplicate ids i for i in 0..19
    val dups = (0 until 20).map(i => (100L + i, uniques(i)._2))
    spark.createDataFrame(uniques ++ dups).toDF("doc_id", "text")
  }

  private val expectedDups = (0 until 20).map(i => (100L + i) -> i.toLong).toMap

  test("exact dedup resolves every planted duplicate to the original id") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .where(col("dup_of").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == expectedDups, s"got $out")
  }

  test("minhash LSH finds every planted exact duplicate (identical signatures)") {
    val out = Dedup.minhashDupOf(corpus, "doc_id", "text")
      .where(col("dup_of").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((d, orig) <- expectedDups)
      assert(out.get(d).exists(_ <= orig), s"dup $d not resolved (got ${out.get(d)})")
  }

  test("simhash finds every planted exact duplicate (identical 32-bit signatures)") {
    val out = Dedup.simhashDupOf(corpus, "doc_id", "text")
      .where(col("dup_of").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((d, orig) <- expectedDups)
      assert(out.get(d).exists(_ <= orig), s"dup $d not resolved (got ${out.get(d)})")
  }

  test("ngram jaccard reports planted duplicates with jaccard 1.0") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((d, orig) <- expectedDups)
      assert(pairs.contains((orig, d)) || pairs.exists(p => p._2 == d),
        s"planted pair ($orig, $d) missing")
  }

  test("bucketed embedding dedup finds identical vectors (identical buckets)") {
    val rnd = new Random(9)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
    val dups = (0 until 10).map(i => (200L + i, base(i)._2))
    val embs = spark.createDataFrame(base ++ dups).toDF("vec_id", "embedding")
    val planes = graft.functions.VectorOps.lshPlanes(6, 16, seed = 2L)
    val pairs = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding",
        threshold = 0.999, bucketed = true, planes = planes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 10)
      assert(pairs.exists(p => p._2 == 200L + i), s"identical vector ${200 + i} not paired")
  }
}
