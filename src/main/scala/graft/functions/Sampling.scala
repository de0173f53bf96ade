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

  /** CCNet-style per-language quality bucketing: score every doc,
    * compute the per-language tercile boundaries, and label each doc
    * head (top third) / middle / tail — the canonical stratification
    * that downstream mixture sampling keys on (keep head, downsample
    * middle, drop tail).
    *
    * Scale shape: boundaries ride a groupBy(lang) aggregate + a
    * BROADCAST join back (a handful of rows), NOT a window partitioned
    * by language — lang has a handful of values, so a lang-partitioned
    * window would put whole sub-corpora in single unsplittable
    * partitions. The exact percentile here is BOUNDED-state despite
    * its name: Spark's Percentile agg buffers a value→count hash, and
    * q4 is a fixed-point s4 integer with ≤10,001 possible values, so
    * the buffer is ≤10,001 entries per lang regardless of corpus size
    * (the unbounded case is a continuous double — that's q_quantiles,
    * which routes through the radix selector).
    * Scores are s4 integers and the boundaries are floored to
    * integers, so every bucket verdict is an integer comparison.
    */
  def qualityBuckets(docs: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    import graft.ts.OracleGen.litD
    val scored = docs.select(col(idCol), col(langCol),
      floor(TextOps.qualityScore(col(textCol)) * 10000d + 0.5d).cast("long").as("q4"))
    val bounds = scored.groupBy(col(langCol)).agg(
      floor(expr(s"percentile(q4, ${litD(1.0 / 3.0)})")).cast("long").as("t1_q4"),
      floor(expr(s"percentile(q4, ${litD(2.0 / 3.0)})")).cast("long").as("t2_q4"))
    scored.join(broadcast(bounds), langCol)
      .withColumn("bucket",
        when(col("q4") <= col("t1_q4"), lit("tail"))
          .when(col("q4") <= col("t2_q4"), lit("middle"))
          .otherwise(lit("head")))
  }

  /** Deterministic importance sampling: keep a row with probability
    * weight/10000 (an s4-scaled integer weight column), decided by the
    * stable id-hash bucket — quality-weighted downsampling as a pure
    * map-only filter, reproducible across re-runs and engines.
    */
  def importanceSample(df: DataFrame, keyCol: String, weightS4: Column): DataFrame =
    df.where(hashBucket(col(keyCol), 10000) < weightS4)

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

  /** Deterministic corpus shuffle into numbered training shards — the
    * "write the shuffled corpus" step before packing: every row gets a
    * shard (hash of the key: a pseudo-random but re-run-stable
    * placement) and a 0-based position within its shard (hash order,
    * key as tiebreak — the within-shard read order training consumes).
    *
    * Scale shape: ONE exchange on the shard key; the position sort is
    * per-shard (pick `shards` so a shard's (hash, key) pairs sort
    * within an executor — the payload is 16 bytes/row, not the text).
    * No global sort, no driver state; a resumable, deterministic
    * global shuffle any engine reproduces bit-for-bit.
    */
  def shardAssign(
      df: DataFrame,
      keyCol: String,
      shards: Int,
      shardCol: String = "shard",
      posCol: String = "pos"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards > 0, s"shards must be positive, got $shards")
    val h = TextOps.h60(col(keyCol).cast("string"))
    val w = Window.partitionBy(shardCol).orderBy(col("__h").asc, col(keyCol).asc)
    df.withColumn("__h", h)
      .withColumn(shardCol, pmod(col("__h"), lit(shards.toLong)).cast("int"))
      .withColumn(posCol, (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Domain-weighted deterministic sampling — the mixture-rebalancing
    * step of corpus assembly ("keep all of domain A, 30% of domain B"):
    * each row's fate is a pure function of (its key hash, its domain's
    * keep fraction), so the sampled mixture is reproducible across
    * re-runs, backfills, and engines. Map-only: the domain column may
    * itself be computed (e.g. language ID) and the whole decision stays
    * inside the scan — no shuffle, no state.
    */
  /** Temperature-rebalanced language sampling (the multilingual
    * α-smoothing of mBERT/XLM-R-style corpora): a language with
    * corpus count N_l keeps docs with probability
    * min(1, scale/√N_l) ∝ share^(α−1) at α = 0.5 — flattening head
    * languages while keeping the tail. α is FIXED at ½ because √ is
    * the one fractional power IEEE-754 rounds correctly on every
    * engine; pow(x, α) for general α differs in the last ulp across
    * libm implementations, which the exact-compare gate would flag.
    * The verdict compares the id-hash bucket against
    * floor(keep·buckets) — integer at probe time, deterministic,
    * reproducible across runs and engines.
    *
    * Scale shape: ONE partial-agg groupBy builds the per-language
    * count table (≤ #languages rows, broadcast back); the verdict is
    * then map-only. Nothing shuffles on the low-cardinality language
    * key.
    */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      langCol: Column,
      scale: Double,
      buckets: Int = 10000): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val counts = df.groupBy(langCol.as("__lang")).agg(count(lit(1)).as("__nl"))
    val keep = least(lit(1.0), lit(scale) / sqrt(col("__nl").cast("double")))
    df.join(broadcast(counts), langCol === col("__lang"))
      .where(hashBucket(col(keyCol), buckets) < floor(keep * buckets).cast("long"))
      .drop("__lang", "__nl")
  }

  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      domainCol: Column,
      weights: Map[String, Double],
      defaultFrac: Double,
      buckets: Int = 10000): DataFrame = {
    require(weights.values.forall(f => f >= 0 && f <= 1) &&
      defaultFrac >= 0 && defaultFrac <= 1, "fractions must be in [0,1]")
    val b = hashBucket(col(keyCol), buckets)
    // integer bucket cutoffs: exact boundaries, no FP compare at probe
    val cut = weights.toSeq.sortBy(_._1).foldLeft(lit((defaultFrac * buckets).toLong)) {
      case (acc, (dom, f)) =>
        when(domainCol === lit(dom), lit((f * buckets).toLong)).otherwise(acc)
    }
    df.where(b < cut)
  }
}
