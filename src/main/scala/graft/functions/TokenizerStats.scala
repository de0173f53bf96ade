package graft.functions

import org.apache.spark.sql.DataFrame
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
}
