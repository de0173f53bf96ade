package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus collocation mining — the top-K token bigrams ranked by
  * pointwise mutual information (PMI), the classic "find the multiword
  * expressions" pass a tokenizer-training or vocabulary-curation
  * pipeline runs before deciding merge candidates ("new york",
  * "machine learning" score high; "of the" scores low despite its raw
  * frequency, because PMI normalizes by the unigram marginals).
  *
  * Ranking: PMI = log(P(w₁w₂)/(P(w₁)P(w₂))) is monotone in the LIFT
  * c₁₂·N/(c₁·c₂), so we rank by the lift and never evaluate a
  * transcendental — Math.log and libm log can differ in the last ulp,
  * which an exact cross-engine compare would flag (the LmScore
  * precedent). The lift itself is exact across engines: each long→
  * double conversion is exact below 2⁵³ and the expression performs
  * the same three IEEE ops in the same association order on both
  * sides — (c₁₂·N)/(c₁·c₂) — which Catalyst will not reassociate
  * (FP reassociation is restricted to integral types).
  *
  * Scale shape — Zipf-safe without a doc-id diffusion stage: both
  * count tables come from partial-agg groupBys whose map-side combine
  * collapses a corpus-hot key ("of the") to ONE row per map task
  * before the exchange (the text_bpe_pairs shape; no count-only
  * window anywhere). The unigram table aggregates to vocabulary size
  * (Heaps' law ≪ corpus) and is broadcast-gated on its measured
  * count with a shuffle fallback; the scalar bigram total N rides a
  * broadcast single-row cross join. The final top-K is
  * TakeOrderedAndProject — per-partition heaps of K rows, never a
  * global sort of the bigram table.
  */
object Collocations {

  /** Top-K collocations with c₁₂ ≥ `minCount`. Output:
    * (w1, w2, c12, c1, c2, n_bigrams, lift), lift-desc with (w1, w2)
    * tiebreak — a deterministic total order.
    */
  def pmiTopK(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 50,
      maxBroadcastVocab: Long = 4000000L): DataFrame = {
    val toks = docs.select(TextOps.tokens(col(textCol)).as("__t"))
    // unigram counts; persisted because the frame feeds the broadcast
    // gate count AND two join probes
    val uni = toks.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = uni.count()
    val hinted = if (vocab <= maxBroadcastVocab) broadcast(uni) else uni
    // adjacent pairs by position (short docs contribute zero pairs and
    // carry no collocation signal — no explode_outer needed here)
    val nPairs = greatest(size(col("__t")) - 1, lit(0))
    val pairs = toks.select(
      explode(zip_with(
        slice(col("__t"), lit(1), nPairs),
        slice(col("__t"), lit(2), nPairs),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // scalar total-bigram count as a broadcast one-row frame: computed
    // from the already-aggregated bigram table (vocab² ceiling), not a
    // second corpus scan
    val total = broadcast(big.agg(sum(col("c12")).as("n_bigrams")))
    val u1 = hinted.withColumnRenamed("__w", "__u1").withColumnRenamed("__cu", "c1")
    val u2 = hinted.withColumnRenamed("__w", "__u2").withColumnRenamed("__cu", "c2")
    big.where(col("c12") >= minCount)
      .join(u1, col("w1") === col("__u1"))
      .join(u2, col("w2") === col("__u2"))
      .crossJoin(total)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("n_bigrams"),
        (col("c12").cast("double") * col("n_bigrams").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
