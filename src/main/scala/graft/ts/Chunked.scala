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
  * `lookBack` ROWS (lag k ≤ lookBack, rollmean/rollstats/ewmaTruncated
  * windows ≤ lookBack+1, trailing taylor with w-1 ≤ lookBack) and whose
  * look-ahead is at most `lookAhead` ROWS (lead h ≤ lookAhead; centered
  * taylor with half-width hw needs lookBack ≥ hw AND lookAhead ≥ hw+1 —
  * the reference's off-by-one marks the rpos==hw row as a never-filled
  * edge, which must only be reproducible at the true series end, so one
  * extra look-ahead row keeps every mid-chunk row interior) produces
  * bit-identical results to the unchunked plan PROVIDED every chunk
  * holds at least `max(lookBack, lookAhead)` rows (pick chunkWidth ≫
  * overlap·median-spacing). The first chunk reproduces the global series start and the
  * last the global end, so group-edge semantics (taylor fill_edges,
  * the reference's centered off-by-one) land exactly where the
  * unchunked plan puts them: interior rows of every chunk see full
  * context via the duplicated rows, and true edge branches can only
  * trigger where the global series actually ends. ChunkedSpec proves
  * equality for both directions and the restored parallelism.
  */
object Chunked {

  /** Trailing-only chunking (look-back overlap only) — kept as the
    * common case's named entry point.
    */
  def chunkedTrailing(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long,
      overlap: Int)(
      features: (DataFrame, Seq[String], Seq[String]) => FeatureResult): FeatureResult =
    chunked(df, groupCols, orderCols, tsCol, chunkWidth, overlap, 0)(features)

  /** General chunked-overlap evaluation: the last `lookBack` rows of
    * every chunk are duplicated into its successor (look-back context)
    * and the first `lookAhead` rows into its predecessor (look-ahead
    * context for centered windows and leads). Features are computed per
    * (group, chunk) — monster keys fan out — and the duplicated rows
    * are dropped afterwards.
    */
  def chunked(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long,
      lookBack: Int,
      lookAhead: Int)(
      features: (DataFrame, Seq[String], Seq[String]) => FeatureResult): FeatureResult = {
    require(lookBack >= 0 && lookAhead >= 0 && chunkWidth > 0)
    val base = df.withColumn("__chunk", floor(col(tsCol) / chunkWidth).cast("long"))
    // boundary rows of each chunk, found with per-chunk windows
    // (parallel across chunks — no global series sort anywhere)
    val keyCols = (groupCols :+ "__chunk").map(col)
    val wDesc = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(c => col(c).desc): _*)
    val wAsc = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(col): _*)
    var marked = base
    if (lookBack > 0) marked = marked.withColumn("__rdesc", row_number().over(wDesc))
    if (lookAhead > 0) marked = marked.withColumn("__rasc", row_number().over(wAsc))
    def strip(d: DataFrame): DataFrame = d.drop("__rdesc", "__rasc")
    var all = strip(marked).withColumn("__ovl", lit(false))
    if (lookBack > 0)
      all = all.unionByName(strip(
        marked.where(col("__rdesc") <= lookBack).withColumn("__chunk", col("__chunk") + 1))
        .withColumn("__ovl", lit(true)))
    if (lookAhead > 0)
      all = all.unionByName(strip(
        marked.where(col("__rasc") <= lookAhead).withColumn("__chunk", col("__chunk") - 1))
        .withColumn("__ovl", lit(true)))
    // look-back copies carry earlier tsCol values than every natural row
    // of their target chunk and look-ahead copies later ones, so the
    // per-(group, chunk) sort places them as the context prefix/suffix
    val res = features(all, groupCols :+ "__chunk", orderCols)
    FeatureResult(res.df.where(!col("__ovl")).drop("__ovl", "__chunk"), res.featureNames)
  }
}
