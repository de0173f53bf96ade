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
    *  2. Each round: adjacent-pair explode weighted by freq →
    *     partial-agg groupBy(pair) → the argmax pair (ONE row) to the
    *     driver — the only driver state is the merge table itself.
    *  3. The merge applies as a fold over each word's symbol array
    *     ([[mergeOnce]] — map-only), and the new state is persisted
    *     while the previous round's is freed, so lineage stays one
    *     fold deep regardless of `rounds`.
    * Ties break deterministically (count desc, then the pair), and all
    * arithmetic is integer — no FP parity surface.
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    // chars of the normalized word; array_remove guards the empty
    // strings Java's split("") can emit at the boundaries
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"),
        array_remove(split(col("__w"), ""), "").as("__s"))
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
}
