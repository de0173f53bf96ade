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

  // ---------------------------------------------------------------------
  // EXPANDING (unbounded-preceding) ops cannot use overlap duplication —
  // the look-back is the whole series prefix. But their state is a
  // handful of PREFIX-COMBINABLE aggregates (sums/counts/min/max), so a
  // monster series still fans out:
  //   1. per-(group, chunk) LOCAL expanding window   — parallel across chunks
  //   2. per-(group, chunk) chunk TOTALS             — one partial-agg groupBy
  //   3. exclusive prefix of the totals over chunks  — a window over the
  //      TINY totals frame (one row per chunk, not per event)
  //   4. join the prefix back on (group, chunk)      — broadcast-sized
  //      at any realistic chunk count; combine prefix ⊕ local.
  // No window anywhere spans more than one chunk of events, so the
  // monster key's serialization point is gone.
  //
  // Exactness: count/min/max combine exactly for any input. Sum combine
  // re-associates FP adds — bit-identical to the straight left-fold plan
  // whenever the partial sums are FP-exact (integer-valued doubles,
  // longs, decimals), within double rounding otherwise.
  // ChunkedExpandingSpec pins bit-equality on integer-valued series.
  // ---------------------------------------------------------------------

  /** Chunked twin of [[TimeOps.expanding]]: running sum/min/max/mean
    * from the group start, same output columns, no whole-series window.
    */
  def chunkedExpanding(
      df: DataFrame,
      c: String,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0)
    val v = col(c)
    val base = df.withColumn("__chunk", floor(col(tsCol) / chunkWidth).cast("long"))
    val keyCols = (groupCols :+ "__chunk").map(col)
    val wLoc = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("__lsum", sum(v).over(wLoc))
      .withColumn("__lmin", min(v).over(wLoc))
      .withColumn("__lmax", max(v).over(wLoc))
      .withColumn("__lcnt", count(v).over(wLoc))
    val totals = base.groupBy(keyCols: _*)
      .agg(sum(v).as("__tsum"), min(v).as("__tmin"), max(v).as("__tmax"),
        count(v).as("__tcnt"))
    val wPre = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals.select(
      keyCols ++ Seq(
        sum(col("__tsum")).over(wPre).as("__psum"),
        min(col("__tmin")).over(wPre).as("__pmin"),
        max(col("__tmax")).over(wPre).as("__pmax"),
        coalesce(sum(col("__tcnt")).over(wPre), lit(0L)).as("__pcnt")): _*)
    // null ⊕ null = null (an all-null prefix has a null running sum in
    // the straight plan too); otherwise missing side = neutral
    val cumsum = when(col("__lsum").isNull && col("__psum").isNull, lit(null))
      .otherwise(coalesce(col("__psum"), lit(0d)) + coalesce(col("__lsum"), lit(0d)))
    val cumcnt = col("__pcnt") + col("__lcnt")
    local.join(prefix, groupCols :+ "__chunk")
      .withColumn(s"${c}_cumsum", cumsum)
      .withColumn(s"${c}_cummin", least(col("__pmin"), col("__lmin")))
      .withColumn(s"${c}_cummax", greatest(col("__pmax"), col("__lmax")))
      .withColumn(s"${c}_expanding_mean", col(s"${c}_cumsum") / cumcnt)
      .drop("__chunk", "__lsum", "__lmin", "__lmax", "__lcnt",
        "__psum", "__pmin", "__pmax", "__pcnt")
  }

  /** Chunked twin of [[TimeOps.drawdown]]: running peak and distance
    * below it. Prefix MAX combines exactly for any doubles — this twin
    * is bit-identical to the straight plan unconditionally.
    */
  def chunkedDrawdown(
      df: DataFrame,
      c: String,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0)
    val v = col(c)
    val base = df.withColumn("__chunk", floor(col(tsCol) / chunkWidth).cast("long"))
    val keyCols = (groupCols :+ "__chunk").map(col)
    val wLoc = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__lmax", max(v).over(wLoc))
    val totals = base.groupBy(keyCols: _*).agg(max(v).as("__tmax"))
    val wPre = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals.select(
      keyCols :+ max(col("__tmax")).over(wPre).as("__pmax"): _*)
    local.join(prefix, groupCols :+ "__chunk")
      .withColumn("peak", greatest(col("__pmax"), col("__lmax")))
      .withColumn("drawdown", col("peak") - v)
      .drop("__chunk", "__lmax", "__pmax")
  }

  /** Chunked twin of [[TimeOps.expandingTrend]]: the running OLS state
    * is six prefix sums plus a row count, all combinable once each
    * chunk's LOCAL position index is shifted by the rows before it —
    *   sx  ⊕= o·n,   sxx ⊕= 2o·sx + o²·n,   sxv ⊕= o·sv
    * (o = prior-row offset). Chunk totals are globalized with their own
    * offset, prefix-summed over the tiny per-chunk frame, and joined
    * back; the slope/intercept/r2 formulas and degeneracy gates are
    * shared verbatim with the straight plan.
    */
  def chunkedExpandingTrend(
      df: DataFrame,
      c: String,
      groupCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0)
    val v = col(c)
    val base = df.withColumn("__chunk", floor(col(tsCol) / chunkWidth).cast("long"))
    val keyCols = (groupCols :+ "__chunk").map(col)
    val wRow = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(col): _*)
    val wLoc = wRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xl = col("__xl")
    val local = base
      .withColumn("__xl", row_number().over(wRow).cast("double") - 1)
      .withColumn("__ln", count(v).over(wLoc).cast("double"))
      .withColumn("__lsx", coalesce(sum(when(v.isNotNull, xl)).over(wLoc), lit(0d)))
      .withColumn("__lsv", coalesce(sum(v).over(wLoc), lit(0d)))
      .withColumn("__lsxx", coalesce(sum(when(v.isNotNull, xl * xl)).over(wLoc), lit(0d)))
      .withColumn("__lsvv", coalesce(sum(v * v).over(wLoc), lit(0d)))
      .withColumn("__lsxv", coalesce(sum(xl * v).over(wLoc), lit(0d)))
    // chunk totals in LOCAL coordinates + the chunk's row count
    val totals = base
      .withColumn("__xl", row_number().over(wRow).cast("double") - 1)
      .groupBy(keyCols: _*)
      .agg(
        count(lit(1)).cast("double").as("__rows"),
        count(v).cast("double").as("__tn"),
        coalesce(sum(when(v.isNotNull, xl)), lit(0d)).as("__tsx"),
        coalesce(sum(v), lit(0d)).as("__tsv"),
        coalesce(sum(when(v.isNotNull, xl * xl)), lit(0d)).as("__tsxx"),
        coalesce(sum(v * v), lit(0d)).as("__tsvv"),
        coalesce(sum(xl * v), lit(0d)).as("__tsxv"))
    // each chunk's global-coordinate totals need ITS offset (rows before
    // it), then an exclusive prefix sum per group — all on the tiny frame
    val wPre = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__chunk"))
    val o = coalesce(sum(col("__rows")).over(wPre.rowsBetween(Window.unboundedPreceding, -1)), lit(0d))
    val globalized = totals
      .withColumn("__o", o)
      .withColumn("__gsx", col("__tsx") + col("__o") * col("__tn"))
      .withColumn("__gsxx",
        col("__tsxx") + lit(2d) * col("__o") * col("__tsx") + col("__o") * col("__o") * col("__tn"))
      .withColumn("__gsxv", col("__tsxv") + col("__o") * col("__tsv"))
    val pre = (e: org.apache.spark.sql.Column) =>
      coalesce(sum(e).over(wPre.rowsBetween(Window.unboundedPreceding, -1)), lit(0d))
    val prefix = globalized.select(
      keyCols ++ Seq(
        col("__o"),
        pre(col("__tn")).as("__pn"),
        pre(col("__gsx")).as("__psx"),
        pre(col("__tsv")).as("__psv"),
        pre(col("__gsxx")).as("__psxx"),
        pre(col("__tsvv")).as("__psvv"),
        pre(col("__gsxv")).as("__psxv")): _*)
    val joined = local.join(prefix, groupCols :+ "__chunk")
    val n = col("__pn") + col("__ln")
    val sx = col("__psx") + col("__lsx") + col("__o") * col("__ln")
    val sv = col("__psv") + col("__lsv")
    val sxx = col("__psxx") + col("__lsxx") +
      lit(2d) * col("__o") * col("__lsx") + col("__o") * col("__o") * col("__ln")
    val svv = col("__psvv") + col("__lsvv")
    val sxv = col("__psxv") + col("__lsxv") + col("__o") * col("__lsv")
    val vx = n * sxx - sx * sx
    val vy = n * svv - sv * sv
    val slope = (n * sxv - sx * sv) / vx
    joined
      .withColumn("trend_n", n.cast("long"))
      .withColumn("slope", when(vx <= 0, lit(null)).otherwise(slope))
      .withColumn("intercept",
        when(vx <= 0, lit(null)).otherwise((sv - slope * sx) / n))
      .withColumn("r2",
        when(vx <= 0 || vy <= 0, lit(null))
          .otherwise((n * sxv - sx * sv) * (n * sxv - sx * sv) / (vx * vy)))
      .drop("__chunk", "__xl", "__ln", "__lsx", "__lsv", "__lsxx", "__lsvv", "__lsxv",
        "__o", "__pn", "__psx", "__psv", "__psxx", "__psvv", "__psxv")
  }
}
