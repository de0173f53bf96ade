package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The text-hash kernels must be bit-identical to the declarative
  * Column forms (whose DuckDB twins the oracles embed): the 60-bit
  * value from digest bytes == conv(substr(md5_hex,1,15),16,10).
  */
class TextHashKernelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "",
    "one",
    "alpha beta gamma alpha beta gamma alpha",
    "num3ric t0kens 42 and punctuation!!",
    "ünïcode tökens stay bytes"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("ShingleHash60 == shingles + shingleHashes") {
    val toks = TextOps.tokens(col("text"))
    val rows = docs.select(
      graft.plans.TextHashKernels.shingleHash60(toks, 3, TextOps.MinhashMod).as("k"),
      TextOps.shingleHashes(TextOps.shingles(toks, 3)).as("d")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("SpanHash60 == declarative transform(sequence, i -> h60(substring))") {
    // includes the boundary cases: len < winLen (empty array), len ==
    // winLen (one span), stride remainders, non-ASCII defensive path
    // (code-point windows), and a long doc that would expose any
    // offset drift in the strided byte walk
    val edge = Seq(
      "", "short", "exactly eight", "a" * 100,
      "the quick brown fox jumps over the lazy dog " * 40,
      "ünïcodé spàn tëxt thät éxercises the code-point päth of spans",
      "日本語テキスト mixed with ascii tokens to shift offsets 日本語")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    for ((winLen, stride) <- Seq((8, 3), (13, 13), (32, 8), (1, 1))) {
      val rows = edge.select(
        graft.plans.TextHashKernels.spanHash60(col("t"), winLen, stride).as("k"),
        when(length(col("t")) >= winLen,
          expr(s"transform(sequence(1, length(t) - ${winLen - 1}, $stride), " +
            s"i -> conv(substr(md5(substring(t, i, $winLen)),1,15),16,10))"))
          .otherwise(array().cast("array<string>")).as("d"),
        col("doc_id")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[String](1).map(_.toLong),
          s"doc ${r.getLong(2)} win=$winLen stride=$stride")
      }
    }
  }

  test("TokenHash60 == tokenHashes32") {
    val toks = TextOps.tokens(col("text"))
    val rows = docs.select(
      graft.plans.TextHashKernels.tokenHash60(toks, 4294967296L).as("k"),
      TextOps.tokenHashes32(toks).as("d")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("FingerprintKernel == declarative aggregate fold") {
    val toks = TextOps.tokens(col("text"))
    val rows = docs.select(
      TextOps.fingerprint(toks).as("k"),
      TextOps.fingerprintDeclarative(toks).as("d")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("hashFeatures: signed-bucket sums replay the token hashes exactly; map-only plan") {
    import spark.implicits._
    val fdocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one one one two"),
      (3L, ""),
      (4L, "solo")).toDF("doc_id", "text")
    val hashes = fdocs.select($"doc_id",
      TextOps.tokenHashes32(TextOps.tokens($"text")).as("th"))
      .as[(Long, Seq[Long])].collect().toMap
    val out = fdocs.select($"doc_id" +: TextOps.hashFeatures($"text", dim = 16): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    for ((id, th) <- hashes) {
      val expect = (0 until 16).map { b =>
        th.filter(_ % 16 == b).map(h => 1L - 2L * ((h >> 16) & 1L)).sum
      }
      assert(out(id) == expect, s"doc $id: ${out(id)} != $expect")
    }
    // "" tokenizes to a single empty-string token (split semantics,
    // engine-identical) → exactly one ±1 contribution in one bucket
    assert(out(3L).map(math.abs).sum == 1L, s"single-token vector: ${out(3L)}")
    val plan = fdocs.select($"doc_id" +: TextOps.hashFeatures($"text", dim = 16): _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"vectorizer must be map-only:\n${plan.take(800)}")
  }

  test("hashFeatureVec kernel is value-identical to the per-bucket spec form") {
    import spark.implicits._
    val fdocs = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one one one two"),
      (3L, ""),
      (4L, "solo")) ++
      (5L to 40L).map(i => (i, Seq.fill(7)(s"w${i % 5} tok$i x").mkString(" "))))
      .toDF("doc_id", "text")
    val dim = 16
    val spec = fdocs.select($"doc_id" +: TextOps.hashFeatures($"text", dim): _*)
      .collect().map(r => r.getLong(0) -> (1 to dim).map(r.getLong)).toMap
    val fused = fdocs
      .select($"doc_id", TextOps.hashFeatureVec($"text", dim).as("fv"))
      .select($"doc_id" +: (0 until dim).map(b => element_at($"fv", b + 1).as(s"f$b")): _*)
      .collect().map(r => r.getLong(0) -> (1 to dim).map(r.getLong)).toMap
    assert(fused == spec)
    // the kernel must appear ONCE in the plan (two-level select blocks
    // per-bucket inlining) and keep the map-only shape — parquet-backed
    // (a literal LocalRelation constant-folds the whole projection)
    val pdocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = pdocs
      .select($"doc_id", TextOps.hashFeatureVec($"text", dim).as("fv"))
      .select($"doc_id" +: (0 until dim).map(b => element_at($"fv", b + 1).as(s"f$b")): _*)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("exchange"), s"fused vectorizer must be map-only:\n${plan.take(800)}")
    val occurrences = "hashfeaturevec".r.findAllIn(plan).length
    assert(occurrences == 1, s"kernel must not be inlined per bucket ($occurrences):\n${plan.take(1200)}")
  }
}
