package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2 rows 25-26).
  *
  * Brute force is the baseline: broadcast the (small) query set against
  * the corpus — one scan, no corpus shuffle, exact answers. The LSH
  * path trades recall for a bucket-equality pre-filter so the candidate
  * set per query is a bucket, not the corpus — the 100 TB shape
  * (bucket histogram ≈ corpus/2^planes per bucket).
  */
object Ann {

  /** Exact top-k by cosine for each query vector. `queries` is expected
    * to be small (it is broadcast); the corpus is never shuffled — the
    * only exchange is the final per-query top-k (k rows per query).
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries.select(col(qIdCol), col(vecCol).as("__qv"))))
      .select(col(qIdCol), col(idCol),
        VectorOps.cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic IVF seed centroids: the K lowest-id corpus vectors.
    * A production build swaps in k-means|| centroids; the INDEX
    * MECHANICS (assignment, inverted cells, nprobe search) are
    * identical and that is what's exercised here.
    */
  def ivfSeedCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))

  /** Assign every corpus vector to its nearest centroid by cosine
    * (ties → lowest cid). Broadcast the centroids; one corpus scan.
    *
    * The per-vector argmax is a map-side-combinable min_by aggregation
    * — a row_number window here would exchange and SORT every
    * (vector × centroid) row on the vector id, where the aggregate
    * pre-combines to one row per vector before the shuffle. Ordering
    * struct (-ccos, cid) ≡ (ccos DESC, cid ASC), deterministic because
    * cid breaks all ties (NaN-free input assumed — a zero vector's NaN
    * cosine would rank differently than the window form).
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("cid"), VectorOps.cosine(col(vecCol), col("cvec")).as("ccos"))
    scored.groupBy(col(idCol))
      .agg(min_by(struct(col(vecCol).as("v"), col("cid")),
        struct((-col("ccos")).as("nc"), col("cid"))).as("__best"))
      .select(col(idCol), col("__best.v").as(vecCol), col("__best.cid").as("cell"))
  }

  /** Cell assignment WITHOUT carrying the vectors: for consumers that
    * only need (id, cell) — e.g. cell histograms — the full form drags
    * every embedding through the centroid cross-join (×K duplication)
    * just to emit it; here the join payload per scored row is 24 bytes.
    */
  def ivfAssignCells(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col("cid"), VectorOps.cosine(col(vecCol), col("cvec")).as("ccos"))
    scored.groupBy(col(idCol))
      .agg(min_by(col("cid"), struct((-col("ccos")).as("nc"), col("cid"))).as("cell"))
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within the probed cells. Per-query candidate set ≈
    * nprobe/K of the corpus — the inverted-file scale shape.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      nCentroids: Int,
      nprobe: Int): DataFrame = {
    val centroids = ivfSeedCentroids(corpus, idCol, vecCol, nCentroids)
    val assigned = ivfAssign(corpus, idCol, vecCol, centroids)
    val qScored = queries.crossJoin(broadcast(centroids))
      .select(col(qIdCol), col(vecCol).as("__qv"), col("cid"),
        VectorOps.cosine(col(vecCol), col("cvec")).as("ccos"))
    val qw = Window.partitionBy(qIdCol).orderBy(col("ccos").desc, col("cid"))
    val probes = qScored.withColumn("__r", row_number().over(qw)).where(col("__r") <= nprobe)
      .select(col(qIdCol), col("__qv"), col("cid").as("cell"))
    val scored = assigned.join(broadcast(probes), "cell")
      .select(col(qIdCol), col(idCol), VectorOps.cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** LSH bucket assignment for the corpus (random hyperplanes). */
  def buckets(corpus: DataFrame, idCol: String, vecCol: String, planes: Seq[Array[Double]]): DataFrame =
    corpus.select(col(idCol), col(vecCol), VectorOps.lshBucket(col(vecCol), planes).as("bucket"))

  /** Multiprobe LSH top-k: probe the query's own bucket plus every
    * hamming-1 neighbor (one plane bit flipped) — recall rises steeply
    * (vectors near a hyperplane land one bit away) while the candidate
    * set stays ~(nPlanes+1)/2^nPlanes of the corpus. Corpus buckets
    * partition the data, so probed candidates are distinct — no dedup
    * join. Deterministic given the fixed planes.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      planes: Seq[Array[Double]]): DataFrame = {
    val cb = buckets(corpus, idCol, vecCol, planes)
    val masks = lit(0L) +: planes.indices.map(j => lit(1L << j))
    val qb = buckets(queries, qIdCol, vecCol, planes)
      .select(col(qIdCol), col(vecCol).as("__qv"),
        explode(array(masks: _*)).as("__m"), col("bucket"))
      .select(col(qIdCol), col("__qv"), col("bucket").bitwiseXOR(col("__m")).as("bucket"))
    val scored = cb.join(broadcast(qb), "bucket")
      .select(col(qIdCol), col(idCol), VectorOps.cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Bucket-restricted top-k: exact cosine, but only within the query's
    * bucket. See lshTopKMultiProbe for the recall-raising variant.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      planes: Seq[Array[Double]]): DataFrame = {
    val cb = buckets(corpus, idCol, vecCol, planes)
    val qb = buckets(queries, qIdCol, vecCol, planes)
      .select(col(qIdCol), col(vecCol).as("__qv"), col("bucket"))
    val scored = cb.join(broadcast(qb), "bucket")
      .select(col(qIdCol), col(idCol), VectorOps.cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
