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

  test("containment catches a small doc embedded in a large one that Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 80).map(i => s"filler$i").mkString(" ")
    val big = filler + " " + small + " " + (81 to 160).map(i => s"filler$i").mkString(" ")
    val corpus = Seq((1L, small), (2L, big),
      (3L, "unrelated words entirely different from everything else present here"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // every 3-shingle of the small doc appears verbatim in the big one
    assert(out.contains((1L, 2L)), s"embedded doc must pair: ${out.keySet}")
    val (ca, cb, c) = out((1L, 2L))
    assert(ca == 1.0, s"containment of small in big must be exactly 1.0, got $ca")
    assert(cb < 0.2, "big doc is NOT contained in the small one")
    assert(c == 1.0)
    // and Jaccard on the same pair is far below any dedup threshold
    val jac = Dedup.ngramJaccardPairsExhaustive(corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.0)
      .where(col("id_a") === 1 && col("id_b") === 2)
      .collect().map(_.getDouble(3))
    assert(jac.headOption.forall(_ < 0.1), s"jaccard is blind to this pair: ${jac.toSeq}")
  }

  test("containment plans partial-agg frequency + semi-join pruning, no window") {
    val plan = Dedup.ngramContainmentPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"no window in the containment path:\n${plan.take(1200)}")
    assert(plan.contains("partial_count(1)"),
      s"shingle frequency must partial-aggregate before its exchange:\n${plan.take(1200)}")
    assert(plan.contains("LeftSemi"),
      s"the frequency cap must prune via a semi join:\n${plan.take(1200)}")
    assert(plan.contains("InMemoryTableScan"),
      s"the kernel output must be served from cache, not recomputed:\n${plan.take(1200)}")
  }

  test("containment frequency cap drops boilerplate shingles from pairing") {
    // the same 3 tokens in every doc → that shingle's freq = 4 > cap 3
    val docs = (1L to 4L).map(i => (i, s"common shingle words unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.01, maxShingleFreq = 3)
    // "common shingle words" is above the cap; remaining shingles are
    // per-doc unique → no pair shares anything
    assert(out.count() == 0, "capped boilerplate must not create pairs")
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

  test("contaminationScores: benchmark overlap fraction per doc, zero for disjoint docs") {
    // benchmark = doc 0; doc 1 is an exact dup (contamination 1.0),
    // doc 2 shares all but the trailing grams, doc 3 is disjoint (0.0)
    val bench = docs.where($"doc_id" === 0)
    val out = Dedup.contaminationScores(docs, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    val score = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(score(0L) == 1.0, "benchmark doc contaminates itself fully")
    assert(score(1L) == 1.0, "exact dup is fully contaminated")
    assert(score(2L) > 0.5 && score(2L) < 1.0, s"near dup partially contaminated, got ${score(2L)}")
    assert(score(3L) == 0.0, "disjoint doc is clean")
    // n_grams/matched are consistent with the score
    out.foreach { r =>
      val (n, m) = (r.getLong(1), r.getLong(2))
      if (n > 0) assert(r.getDouble(3) == m.toDouble / n)
    }
  }

  test("contaminationScores plans a broadcast of the benchmark grams (no corpus self-shuffle)") {
    val bench = docs.where($"doc_id" === 0)
    val plan = Dedup.contaminationScores(docs, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"), "corpus side must not sort-merge")
  }

  test("contaminationScores: oversized benchmark falls back to a shuffle join, value-identical") {
    val bench = docs.where($"doc_id" <= 1)
    def run(gate: Long) =
      Dedup.contaminationScores(docs, bench, "doc_id", "text", n = 5, maxBroadcastGrams = gate)
    // disable Catalyst's size-based auto-broadcast so this tiny test
    // frame behaves like a genuinely oversized one: what remains is
    // exactly the effect of the measured-count hint gate
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // gate 0 forces the no-broadcast path (no driver OOM surface on a
      // 10M-doc "benchmark")
      val fallback = run(0L)
      val plan = fallback.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"gate 0 must not broadcast:\n${plan.take(1500)}")
      // a passing gate still FORCES the broadcast via the hint even
      // when the size estimate wouldn't pick it
      val hinted = run(4000000L)
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "passing gate must hint the broadcast")
      // both paths produce identical scores
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows(fallback) == rows(hinted))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("langid picks english for english text") {
    val lang = docs.select(TextOps.langid(TextOps.tokens($"text"))).head().getString(0)
    assert(lang == "en")
  }

  test("exactVerified (text-compared) agrees with exact (digest-keyed) on a collision-free corpus") {
    val a = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Dedup.exactVerified(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("ngram jaccard: shuffle-join fallback is value-identical to the broadcast path on a dup-heavy corpus") {
    // 50% duplicate corpus — the workload where unconditional broadcast
    // of the candidate set would OOM a driver at scale
    val heavy = (0 until 120).map { i =>
      val base = s"shared duplicated content block number ${i % 60} with enough tokens to shingle cleanly"
      (i.toLong, base)
    }.toDF("doc_id", "text")
    def run(gate: Long) =
      Dedup.ngramJaccardPairs(heavy, "doc_id", "text", threshold = 0.5, maxBroadcastCandidates = gate)
        .select("id_a", "id_b", "shared", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val broadcastPath = run(4000000L)
    val shufflePath = run(0L) // gate forces the non-broadcast joins
    assert(broadcastPath == shufflePath)
    assert(broadcastPath.nonEmpty, "dup-heavy corpus must produce pairs")
    // every doc i >= 60 duplicates doc i-60 → that pair must be found at jaccard 1.0
    assert(broadcastPath.exists { case (a, b, _, j) => a == 0L && b == 60L && j == 1.0 })
  }

  test("simhashDupOf works with an id column name that needs quoting") {
    val odd = docs.withColumnRenamed("doc_id", "doc id")
    val out = Dedup.simhashDupOf(odd, "doc id", "text").orderBy(col("doc id")).collect()
    val dupOf = out.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    assert(dupOf(1).contains(0L), "exact dup must be found under a quoted id column")
  }
}
