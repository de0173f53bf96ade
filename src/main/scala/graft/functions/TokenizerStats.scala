package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training support: corpus statistics a BPE/WordPiece
  * trainer consumes. The expensive part of a BPE training round is
  * exactly this scan — count every adjacent symbol pair across the
  * corpus and take the most frequent as the next merge — and at
  * 100 TB it is the part that must be distributed; the merge-table
  * update between rounds is driver-side and tiny.
  */
object TokenizerStats {

  /** Top-k adjacent token-pair counts (the BPE merge-candidate scan)
    * over whitespace tokens of the normalized text.
    *
    * Shape: map-only pair explode → hash aggregation with map-side
    * partial combine (the only exchange carries (pair, partial count),
    * already collapsed to distinct pairs per mapper) → top-k as
    * TakeOrderedAndProject (per-partition heap + driver merge of k
    * rows, never a global sort). Ties at the cut are broken by the
    * pair itself, so the result is a deterministic total order.
    */
  def topPairs(docs: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    val toks = docs.select(TextOps.tokens(col(textCol)).as("__t"))
    val nPairs = greatest(size(col("__t")) - 1, lit(0))
    toks.select(explode(zip_with(
        slice(col("__t"), lit(1), nPairs),
        slice(col("__t"), lit(2), nPairs),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w1"), asc("w2"))
      .limit(k)
  }

  /** One greedy left-to-right BPE merge over a symbol array: scan the
    * symbols, fusing each adjacent (a, b) into ab and continuing AFTER
    * the fused symbol — a left fold whose "fuse" test looks at the
    * accumulator's last element, which is exactly the non-overlapping
    * greedy rule ("x x x x" under (x,x) → [xx, xx], because a fused xx
    * no longer equals x). Pure `aggregate` higher-order function —
    * codegen-friendly, no UDF. `get` (not element_at) keeps the
    * empty-accumulator probe null-safe under ANSI mode.
    */
  private[functions] def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        get(acc, size(acc) - 1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Unsigned UTF-8 byte order — Spark's string `asc` compares
    * UTF8String bytes, and the local trainer must break ties exactly
    * as the distributed argmax does (Java String.compareTo orders by
    * UTF-16 units, which diverges outside the BMP).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-local BPE merge loop over a collected (word, freq)
    * vocabulary — bit-identical algorithm to the distributed loop:
    * same freq-weighted pair counts, same (count desc, lhs, rhs)
    * UTF-8-binary tie-break, same greedy left-to-right
    * non-overlapping fuse as [[mergeOnce]]. Spec-pinned equal to the
    * distributed verdicts ([[bpeTrain]] routes here under the
    * local-finish threshold).
    */
  private[functions] def bpeTrainLocal(vocab: Array[(String, Long)],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    // split into code-point symbols exactly like split(word, "") does
    val syms: Array[Array[String]] = vocab.map { case (w, _) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    val freqs = vocab.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val f = freqs(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = Long.MinValue
        counts.foreach { case (k, n) =>
          val wins = best == null || n > bestN || (n == bestN &&
            (utf8Less(k._1, best._1) ||
              (k._1 == best._1 && utf8Less(k._2, best._2))))
          if (wins) { best = k; bestN = n }
        }
        val (a, b) = best
        merges += ((r.toLong, a, b, bestN))
        val ab = a + b
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            if (s(i) == a && s(i + 1) == b) has = true
            i += 1
          }
          if (has) {
            // greedy left-to-right, continuing AFTER each fuse — the
            // mergeOnce fold rule (the fused symbol no longer equals a)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                out += ab; i += 2
              } else { out += s(i); i += 1 }
            }
            syms(wi) = out.toArray
          }
          wi += 1
        }
        r += 1
      }
    }
    merges.toSeq
  }

  /** Distributed BPE training (the iterated loop over [[topPairs]]'
    * one-round scan — Sennrich et al. 1508.07909 re-expressed for
    * Spark): learn `rounds` merges over the corpus, returning the
    * merge table (rank, lhs, rhs, pair_count).
    *
    * Scale shape — the part that must be distributed is distributed,
    * and the loop iterates on collapsed state:
    *  1. The corpus is scanned ONCE into (word, freq) — a partial-agg
    *     groupBy that collapses 100 TB of text to a vocabulary-sized
    *     table (Heaps' law), which is what every subsequent round
    *     touches. This is the classic trainer trick: pair statistics
    *     over words × freq equal pair statistics over the corpus.
    *  2. LOCAL FINISH (r13): the vocabulary's measured row count
    *     decides the loop's venue. A real tokenizer needs 30k+ merges
    *     = 30k+ Spark jobs if every argmax round-trips the cluster;
    *     once the collapsed (word, freq) table fits the driver bound
    *     (`localFinishMaxVocab` rows — the knob; 0 forces the
    *     distributed loop), the remaining merges run driver-local
    *     over the collected vocab with the BIT-IDENTICAL algorithm
    *     (same weighted counts, same UTF-8-binary tie-break, same
    *     greedy fuse — spec-pinned equal). The corpus scan is still
    *     the distributed part; only the vocabulary-sized iteration
    *     moves. Web-scale vocabularies above the bound keep the
    *     distributed loop below.
    *  3. Distributed rounds: adjacent-pair explode weighted by freq →
    *     partial-agg groupBy(pair) → the argmax pair (ONE row) to the
    *     driver — the only driver state is the merge table itself.
    *     The merge applies as a fold over each word's symbol array
    *     ([[mergeOnce]] — map-only), and the new state is persisted
    *     while the previous round's is freed, so lineage stays one
    *     fold deep regardless of `rounds`.
    * Ties break deterministically (count desc, then the pair), and all
    * arithmetic is integer — no FP parity surface.
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int,
      localFinishMaxVocab: Long = 1L << 18): DataFrame = {
    // chars of the normalized word; array_remove guards the empty
    // strings Java's split("") can emit at the boundaries
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"),
        array_remove(split(col("__w"), ""), "").as("__s"))
    bpeTrainFromWords(words, rounds, localFinishMaxVocab)
  }

  /** [[bpeTrain]] taking the collapsed (word, freq, symbols) table
    * directly — so a caller that already tokenized the corpus (the
    * encode path's per-(doc, word) rollup) feeds the trainer WITHOUT a
    * second full-corpus tokenize scan: pair statistics over words ×
    * freq equal pair statistics over the corpus regardless of which
    * rollup produced the freqs (identical integer counts).
    */
  def bpeTrainFromWords(words: DataFrame, rounds: Int,
      localFinishMaxVocab: Long = 1L << 18): DataFrame = {
    val spark = words.sparkSession
    // r22 (guide §2.6 — fewer sequential driver round-trips): the old
    // local-finish gate ran TWO jobs over the persisted vocab (count,
    // then collect) plus the cache write. One size-guarded collect
    // (limit bound+1 — the extra row is the "too big" sentinel) decides
    // AND fetches in a single job with no persist at all; identical
    // verdict (rows ≤ bound ⟺ count ≤ bound) and identical vocab. Only
    // an over-bound corpus pays a recompute, and it was headed into the
    // distributed loop's own persist anyway.
    if (localFinishMaxVocab > 0) {
      val probe = words.select(col("__w"), col("__f"))
        .limit((localFinishMaxVocab + 1).min(Int.MaxValue.toLong).toInt).collect()
      if (probe.length <= localFinishMaxVocab) {
        val vocab = probe.map(r => (r.getString(0), r.getLong(1)))
        import spark.implicits._
        return bpeTrainLocal(vocab, rounds).toDF("rank", "lhs", "rhs", "pair_count")
      }
    }
    var state = words.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deferred unpersist: round r's argmax action is what materializes
    // state_r's cache (computing the pair aggregate computes — and
    // therefore caches — its persisted input), so state_{r-1} becomes
    // safe to free only AFTER that collect; freeing it then costs zero
    // extra jobs, where an eager count() per round would add one
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val nPairs = greatest(size(col("__s")) - 1, lit(0))
      val top = state
        .select(explode(zip_with(
          slice(col("__s"), lit(1), nPairs),
          slice(col("__s"), lit(2), nPairs),
          (a, b) => struct(a.as("l"), b.as("r")))).as("__p"), col("__f"))
        .groupBy(col("__p.l").as("__l"), col("__p.r").as("__r"))
        .agg(sum(col("__f")).as("__n"))
        .orderBy(desc("__n"), asc("__l"), asc("__r"))
        .limit(1).collect()
      // state is now materialized in cache — the previous round's
      // blocks can go
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (a, b, n) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r.toLong, a, b, n))
        prev = state
        state = state
          .withColumn("__s", mergeOnce(col("__s"), a, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r += 1
      }
    }
    if (prev != null) prev.unpersist()
    state.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** APPLY the trained tokenizer — the second half of the BPE story
    * (training a merge table is pointless until the corpus is encoded
    * with it): learn `rounds` merges via [[bpeTrain]], then tokenize
    * every document under them and report per-doc whitespace-word and
    * BPE-token counts (the numbers a data pipeline budgets context
    * windows and compute by).
    *
    * Scale shape: the merge table is `rounds` rows of driver state;
    * merges apply to the DISTINCT-WORD vocabulary (Heaps' law — the
    * same collapse the trainer rides), as `rounds` chained
    * [[mergeOnce]] folds (codegen'd `aggregate` HOFs; for a 30k-merge
    * production tokenizer swap the fold chain for a trie-walk
    * mapPartitions — documented, not needed at feature-scale rounds).
    * Per-(doc, word) multiplicities partial-aggregate BEFORE the
    * vocab join (Zipf-hot words collapse map-side, the text_lm_score
    * shape), and the token-count table joins back broadcast-gated on
    * its measured size (vocab ≪ corpus; shuffle fallback above the
    * bound). Integer counts everywhere; the one division
    * (tokens_per_word) is identical-operand cross-engine.
    */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, localFinishMaxVocab: Long = 1L << 18,
      maxBroadcastVocab: Long = 4000000L): DataFrame = {
    // NOTE (r21): deriving the trainer's (word, freq) vocabulary from a
    // persisted (doc, word) rollup — one tokenize scan instead of two —
    // was tried and MEASURED SLOWER (pipeline_e2e 3.88 → 4.9 s at
    // sf0.1): the rollup cache write plus the extra re-aggregation
    // outweigh a tokenize scan, whose map-side word collapse already
    // makes the trainer's own scan cheap. Two lean scans beat one
    // scan + one fat cache here; kept as the trainer's independent scan.
    // r22: train inline so the local-finish probe's MEASURED vocab
    // size also decides the encode-side broadcast gate — when the
    // whole vocabulary fit the driver (≤ localFinishMaxVocab ≤ the
    // 4M broadcast bound), nTok's row count is that same vocab size
    // and the former nTok.persist + count() gate action (one full
    // tokenize+distinct scan + a cache write) is pure overhead. The
    // distributed-trainer path keeps the measured-count gate.
    val words0 = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"),
        array_remove(split(col("__w"), ""), "").as("__s"))
    val probeRan = localFinishMaxVocab > 0 && localFinishMaxVocab <= maxBroadcastVocab
    val probe: Array[org.apache.spark.sql.Row] =
      if (probeRan)
        words0.select(col("__w"), col("__f"))
          .limit((localFinishMaxVocab + 1).min(Int.MaxValue.toLong).toInt).collect()
      else Array.empty
    val localVocab = probeRan && probe.length <= localFinishMaxVocab
    val merges: Array[(String, String)] =
      if (localVocab)
        bpeTrainLocal(probe.map(r => (r.getString(0), r.getLong(1))), rounds)
          .map(m => (m._2, m._3)).toArray
      else
        bpeTrainFromWords(words0, rounds, if (probeRan) 0 else localFinishMaxVocab)
          .orderBy("rank").collect()
          .map(r => (r.getString(1), r.getString(2)))
    val dw = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__cnt"))
    val vocab0 = dw.select("__w").distinct()
      .withColumn("__s", array_remove(split(col("__w"), ""), ""))
    // the whole merge chain as ONE kernel call per vocab word
    // (plans.BpeCountKernel) instead of `rounds` chained interpreted
    // aggregate() HOF passes — same greedy fuse rule, spec-pinned
    val nTok0 = vocab0
      .select(col("__w"),
        graft.plans.TextHashKernels.bpeCount(col("__s"), merges.toSeq).as("__ntok"))
    // broadcast gate: when the trainer's probe measured the WHOLE
    // vocabulary under localFinishMaxVocab (≤ the broadcast bound by
    // the probeRan guard), nTok has exactly that many rows — broadcast
    // without the former persist + count() action (one fewer full
    // tokenize scan + cache write per encode). The distributed-trainer
    // path keeps the measured-count gate verbatim.
    val gate =
      if (localVocab) broadcast(nTok0)
      else {
        val nTok = nTok0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        if (nTok.count() <= maxBroadcastVocab) broadcast(nTok) else nTok
      }
    val perDoc = dw.join(gate, Seq("__w"))
      .groupBy(col(idCol)).agg(
        sum(col("__cnt")).as("n_words"),
        sum(col("__cnt") * col("__ntok")).as("n_bpe_tokens"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"))
  }
}
