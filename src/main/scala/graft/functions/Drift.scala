package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: the Population Stability Index between a
  * reference and a candidate slice of a corpus — THE production
  * question a training-data pipeline asks between two crawl snapshots
  * ("did the length/quality/language mix move?") before a new mix is
  * trained on. PSI = Σ_bins (q_b − p_b)·ln(q_b / p_b) over a shared
  * binning; the conventional read: < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  *
  * Engineering shape (100 TB read): the ONLY corpus-wide work is one
  * partial-agg groupBy over (bin) — map-side combinable counts, one
  * exchange of ≤ 16 rows per task. Everything after (totals, fracs,
  * PSI terms, the running PSI) runs on the ≤ 16-row reduced frame, so
  * the unpartitioned windows below are windows over sixteen rows, not
  * the corpus. Binning is an INTEGER log2 ladder (a literal CASE — no
  * libm in the bucket decision, so a value can never flip bins across
  * engines), which also makes the binning scale-free: the same query
  * is meaningful on a 150-char synthetic doc table and an 8,000-char
  * real corpus.
  *
  * Cross-engine exactness: counts are integers; fractions are one
  * exact-integer IEEE division each; the PSI term is the house
  * `round(…, 4) + 0.0E0` libm surface (ln); the cumulative PSI is a
  * running window sum in PINNED ascending-bin order, so both engines
  * accumulate in the same association. Bins where either side is
  * empty contribute a NULL term (visible in the counts beside it)
  * rather than the ε-smoothing hack — ε would make the statistic
  * depend on a magic constant.
  */
object Drift {

  /** Integer log2 bucket ladder for a non-negative integer column:
    * bin k ⇔ 2^k ≤ v < 2^(k+1), clamped to [0, 15]. Shared verbatim
    * with the oracle (pure integer comparisons — bit-exact trivially).
    */
  def logBinSql(col: String): String = {
    val whens = (1 to 15).map(k => s"when $col < ${1L << k} then ${k - 1}").mkString(" ")
    s"case $whens else 15 end"
  }

  /** Side fractions over the reduced frame: null on an empty side
    * (instead of an inf-producing division).
    */
  val RefFracSql = "case when ref_t = 0 then null else cast(ref_n as double) / ref_t end"
  val CandFracSql = "case when cand_t = 0 then null else cast(cand_n as double) / cand_t end"

  /** One bin's PSI contribution; null when the bin is one-sided. */
  val PsiTermSql: String =
    "case when ref_n = 0 or cand_n = 0 or ref_frac is null or cand_frac is null then null " +
      "else round((cand_frac - ref_frac) * ln(cand_frac / ref_frac), 4) + 0.0E0 end"

  /** PSI drift report between the even-`idCol` (reference) and
    * odd-`idCol` (candidate) halves of `df` over the log2-binned
    * `featCol`: one row per occupied bin with both side counts, both
    * fractions, the bin's PSI term, and the running PSI (`psi_cum` —
    * its last row is the corpus PSI). In production the two sides are
    * two snapshots; the parity split makes the operator self-contained
    * over one table and is exactly as hard for the engine.
    */
  def corpusDrift(df: DataFrame, idCol: String, featCol: String): DataFrame = {
    val sided = df.select(
      expr(logBinSql(featCol)).as("bin"),
      (col(idCol) % 2 === 0).as("__ref"))
    val counts = sided.groupBy("bin").agg(
      sum(when(col("__ref"), 1L).otherwise(0L)).as("ref_n"),
      sum(when(!col("__ref"), 1L).otherwise(0L)).as("cand_n"))
    // ≤ 16 rows from here down — the unpartitioned windows are over
    // the reduced frame, not the corpus (plan note above)
    val whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("ref_t", sum("ref_n").over(whole))
      .withColumn("cand_t", sum("cand_n").over(whole))
      .withColumn("ref_frac", expr(RefFracSql))
      .withColumn("cand_frac", expr(CandFracSql))
      .withColumn("psi_term", expr(PsiTermSql))
      .withColumn("psi_cum", sum("psi_term").over(cum))
      .select("bin", "ref_n", "cand_n", "ref_frac", "cand_frac", "psi_term", "psi_cum")
  }
}
