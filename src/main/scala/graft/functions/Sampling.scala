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
}
