package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity filter" quality signal for training-data curation: train
  * token statistics on the corpus itself, then score every document by
  * its mean smoothed bigram probability. Documents whose token
  * transitions are improbable under the corpus's own statistics
  * (gibberish, lorem-ipsum, encoding garbage, wrong-language spans)
  * score low and can be cut by thresholding.
  *
  * Model: add-one-smoothed conditional P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V)
  * with c(·) = corpus occurrence counts and V = vocabulary size. The
  * per-document score is the mean of P over the doc's bigrams.
  *
  * Cross-engine exactness (the driver compares doubles bit-for-bit):
  * every per-bigram probability is one IEEE division of exact integers
  * followed by one multiply and a floor — identical on any IEEE-754
  * engine — and the per-document reduction is an INTEGER sum of those
  * floored e9-scaled probabilities, so it is association-free; the
  * only double in the output is one final division. No transcendental
  * (log/exp) appears anywhere: Math.log and C libm log can differ in
  * the last ulp, which an exact-compare gate would flag.
  *
  * Scale shape — Zipf-safe by construction. Natural-language bigram
  * frequency is Zipfian: at corpus scale the top bigram ("of the") is
  * a fixed PERCENTAGE of all pairs, so any plan that shuffles the full
  * pair frame onto the bare (w₁,w₂) key puts hundreds of GB in one
  * partition. An earlier revision did exactly that with a count-only
  * window — and WindowExec partitions cannot be AQE-split (windows
  * need whole partitions; spill saves the OOM, not the straggler).
  * Current shape:
  *  1. groupBy(doc, w₁, w₂) → per-doc bigram multiplicity. The doc id
  *     in the key DIFFUSES the hot bigram across documents, and the
  *     partial (map-side) aggregation collapses within-doc repeats
  *     before the exchange.
  *  2. groupBy(w₁, w₂) over that → corpus counts. Partial aggregation
  *     collapses the hot key to ONE row per map task before the
  *     exchange, so the reduce side receives ≤ #tasks rows per bigram
  *     no matter how hot it is.
  *  3. Shuffle JOIN back (not a window): per-bigram probe rows are
  *     bounded by #docs-containing-it, and a join exchange — unlike a
  *     window — is exactly what AQE's OptimizeSkewedJoin can split.
  * The per-occurrence integer sum becomes Σ n_db·pe9 — an integer
  * multiply per distinct (doc, bigram), bit-identical to the
  * per-occurrence sum. The unigram table aggregates to vocabulary size
  * (≪ corpus; Heaps' law) and is broadcast-gated on its measured count
  * (the Dedup.ngramJaccardPairs precedent — AQE's SMJ→BHJ conversion
  * fires only after the probe side's shuffle map stage is submitted,
  * so the explicit pre-count is what saves the probe exchange); an
  * oversized vocabulary falls back to a shuffle join. The corpus is
  * tokenized twice (pairs + unigrams) — both map-only scans; at
  * petabyte scale persist/checkpoint the token frame instead.
  */
object LmScore {

  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxBroadcastVocab: Long = 4000000L): DataFrame = {
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    // unigram occurrence counts; persisted because the frame feeds both
    // the vocabulary count (the V constant AND the broadcast gate) and
    // the probability join
    val uni = toks.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = uni.count()
    val hinted = if (vocab <= maxBroadcastVocab) broadcast(uni) else uni
    // adjacent pairs by position; explode_outer keeps <2-token docs in
    // the output with n_bigrams = 0
    val nPairs = greatest(size(col("__t")) - 1, lit(0))
    val pairs = toks.select(col(idCol),
      explode_outer(zip_with(
        slice(col("__t"), lit(1), nPairs),
        slice(col("__t"), lit(2), nPairs),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
    // stage 1: per-(doc, bigram) multiplicity — the doc id in the key
    // diffuses Zipf-hot bigrams; null pair rows (short docs) ride
    // through as (doc, null, null) so every doc reaches the rollup
    val docPair = pairs.groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__ndb"))
    // stage 2: corpus bigram counts via partial-agg groupBy — the hot
    // key collapses to one row per map task BEFORE the exchange (the
    // count-only window this replaces shuffled every occurrence onto
    // the bare pair key: an unsplittable straggler at corpus scale)
    val bigram = docPair.where(col("__w1").isNotNull)
      .groupBy(col("__w1"), col("__w2"))
      .agg(sum(col("__ndb")).as("__cb"))
      .withColumnRenamed("__w1", "__b1").withColumnRenamed("__w2", "__b2")
    // stage 3: join back — an AQE-skew-splittable exchange, unlike a
    // window partition
    val scored = docPair
      .join(bigram,
        col("__w1") === col("__b1") && col("__w2") === col("__b2"), "left")
      .join(hinted, col("__w1") === uni("__w"), "left")
      .withColumn("__pe9",
        when(col("__w1").isNotNull,
          floor(((col("__cb") + 1).cast("double") /
            (col("__cu") + lit(vocab)).cast("double")) * lit(1.0e9)).cast("long")))
    scored.groupBy(col(idCol))
      .agg(
        coalesce(sum(when(col("__w1").isNotNull, col("__ndb"))), lit(0L))
          .as("n_bigrams"),
        coalesce(sum(col("__ndb") * col("__pe9")), lit(0L)).as("score_e9"))
      .select(col(idCol), col("n_bigrams"), col("score_e9"),
        when(col("n_bigrams") > 0,
          col("score_e9").cast("double") /
            (col("n_bigrams").cast("double") * lit(1.0e9)))
          .as("mean_prob"))
  }
}
