package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and splitting — the
  * reproducibility primitive of a training-data pipeline. Spark's
  * `sample()` depends on partition layout and seed plumbing; keying the
  * decision on a content hash of a stable id makes every row's fate a
  * pure function of the row (re-runs, backfills, and other engines —
  * the DuckDB oracle included — agree bit-for-bit), and keeps the
  * operation a map-only scan: no shuffle, no state, trivially
  * cluster-parallel at any scale.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the 60-bit md5 of the key's
    * string form. Uniform for any key type with a canonical string
    * rendering.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    TextOps.h60(key.cast("string")) % buckets

  /** Keep ≈ fraction of rows, decided per-row by hash bucket — stable
    * under re-runs and across engines.
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double, buckets: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hashBucket(col(keyCol), buckets) < (fraction * buckets).toLong)
  }

  /** Deterministic train/validation/test split: bucket < train·B →
    * "train", < (train+valid)·B → "valid", else "test". Fractions are
    * resolved to integer bucket cutoffs so the boundary is exact.
    */
  def split(
      df: DataFrame,
      keyCol: String,
      trainFrac: Double,
      validFrac: Double,
      buckets: Int = 10000,
      splitCol: String = "split"): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1.0,
      s"invalid split fractions ($trainFrac, $validFrac)")
    val b = hashBucket(col(keyCol), buckets)
    val trainCut = (trainFrac * buckets).toLong
    val validCut = ((trainFrac + validFrac) * buckets).toLong
    df.withColumn(splitCol,
      when(b < trainCut, "train").when(b < validCut, "valid").otherwise("test"))
  }

  /** Exact-n stratified sample: the `n` rows of each stratum whose
    * 60-bit key hash ranks lowest (key as final tiebreak — total order,
    * fully deterministic). Hash-rank ≈ a uniform draw per row, so the
    * selection is an unbiased without-replacement sample of each
    * stratum that any engine reproduces bit-for-bit — the curation
    * primitive for "give me exactly N docs per language/source".
    *
    * Scale shape: one exchange on the stratum key; the rank filter is
    * rewritten by Catalyst into WindowGroupLimit, so each partition
    * keeps a running top-n instead of fully sorting its stratum.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      n: Int,
      rankCol: String = "sample_rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n must be positive, got $n")
    val h = TextOps.h60(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn(rankCol, row_number().over(w).cast("int"))
      .where(col(rankCol) <= n)
  }
}
