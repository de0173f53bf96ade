package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunked-overlap evaluation for trailing-window feature pipelines —
  * the skew escape hatch promised in SURVEY §5.
  *
  * A single monster series serializes the per-group window sort: one
  * partition, one task, however large the key. This splits each series
  * into time chunks, duplicates the last `overlap` rows of every chunk
  * into its successor, computes the features per (group, chunk) — so
  * the shuffle key becomes (group, chunk) and a monster key fans out
  * over chunks·parallelism — and drops the duplicated rows afterwards.
  *
  * Value-equality contract: any feature whose look-back is at most
  * `overlap` ROWS (lag k ≤ overlap, rollmean/rollstats/ewmaTruncated
  * windows ≤ overlap+1, trailing taylor with w-1 ≤ overlap) produces
  * bit-identical results to the unchunked plan PROVIDED every chunk's
  * predecessor holds at least `overlap` rows (pick chunkWidth ≫
  * overlap·median-spacing); the first chunk reproduces the global
  * series start. Centered/lead-based features need look-AHEAD and are
  * out of contract. ChunkedSpec proves equality and the restored
  * parallelism.
  */
object Chunked {

  def chunkedTrailing(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long,
      overlap: Int)(
      features: (DataFrame, Seq[String], Seq[String]) => FeatureResult): FeatureResult = {
    require(overlap >= 0 && chunkWidth > 0)
    val base = df.withColumn("__chunk", floor(col(tsCol) / chunkWidth).cast("long"))
    // last `overlap` rows of each chunk, found with a per-chunk window
    // (parallel across chunks — no global series sort anywhere)
    val w = Window.partitionBy((groupCols :+ "__chunk").map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val marked = base.withColumn("__rdesc", row_number().over(w))
    val copies = marked.where(col("__rdesc") <= overlap)
      .withColumn("__chunk", col("__chunk") + 1)
      .withColumn("__ovl", lit(true))
    val all = marked.withColumn("__ovl", lit(false))
      .unionByName(copies)
      .drop("__rdesc")
    // overlap rows carry earlier tsCol values than every natural row of
    // their target chunk, so the per-(group, chunk) sort places them as
    // the look-back prefix
    val res = features(all, groupCols :+ "__chunk", orderCols)
    FeatureResult(res.df.where(!col("__ovl")).drop("__ovl", "__chunk"), res.featureNames)
  }
}
