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

  /** Collect a (cid, cvec) centroid frame to the driver, cid-ascending
    * — K rows, the IVF analogue of broadcasting a dim table — returning
    * the centroid vectors (as doubles, the same values CosineSim casts
    * to) and the cid literals in matching order.
    */
  private def collectCentroids(centroids: DataFrame): (Array[Array[Double]], Array[Column]) = {
    val rows = centroids.select(col("cid"), col("cvec")).orderBy(col("cid")).collect()
    require(rows.nonEmpty, "ivf: empty centroid frame")
    val vecs = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val cids = rows.map(r => lit(r.get(0)))
    (vecs, cids)
  }

  /** Assign every corpus vector to its nearest centroid by cosine
    * (ties → lowest cid) with ZERO shuffle: the K centroids are plan
    * literals inside a one-pass nearest-centroid kernel
    * (plans.NearestCentroidKernel), so assignment is a map-only scan —
    * no centroid cross-join, no per-vector argmax exchange. The kernel
    * is value-identical to the cross-join + min_by spec form
    * ([[ivfAssignShuffled]], parity spec-pinned): same cosine doubles,
    * same lowest-cid tie-break (centroids enter the kernel
    * cid-ascending).
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val (vecs, cids) = collectCentroids(centroids)
    val idx = graft.plans.HashExpressions.nearestCentroid(col(vecCol), vecs.toSeq)
    corpus.select(col(idCol), col(vecCol), element_at(array(cids.toSeq: _*), idx + 1).as("cell"))
  }

  /** Cell assignment WITHOUT carrying the vectors: for consumers that
    * only need (id, cell) — e.g. cell histograms. Same zero-shuffle
    * kernel scan as [[ivfAssign]], minus the embedding column.
    */
  def ivfAssignCells(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val (vecs, cids) = collectCentroids(centroids)
    val idx = graft.plans.HashExpressions.nearestCentroid(col(vecCol), vecs.toSeq)
    corpus.select(col(idCol), element_at(array(cids.toSeq: _*), idx + 1).as("cell"))
  }

  /** Spec twin of [[ivfAssign]]: the declarative cross-join + min_by
    * argmax (one full-corpus exchange). Kept as the readable
    * specification the kernel mirrors and for the parity spec; the
    * kernel path is the production shape. Ordering struct (-ccos, cid)
    * ≡ (ccos DESC, cid ASC), deterministic because cid breaks all ties
    * (NaN-free input assumed).
    */
  def ivfAssignShuffled(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("cid"), VectorOps.cosine(col(vecCol), col("cvec")).as("ccos"))
    scored.groupBy(col(idCol))
      .agg(min_by(struct(col(vecCol).as("v"), col("cid")),
        struct((-col("ccos")).as("nc"), col("cid"))).as("__best"))
      .select(col(idCol), col("__best.v").as(vecCol), col("__best.cid").as("cell"))
  }

  /** k-means|| trained centroids (MLlib KMeans) — the production
    * quantizer: seed centroids give lousy cell balance on real corpora,
    * collapsing nprobe recall. Training is one MLlib job over the
    * vectors; the resulting (cid, cvec) frame plugs into the same
    * ivfAssign/ivfTopK mechanics as any other quantizer. cids are the
    * 0..k-1 cluster indices.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 1L,
      maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val feat = corpus.select(org.apache.spark.ml.functions.array_to_vector(col(vecCol)).as("__f"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("__f").fit(feat)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cid", "cvec")
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within the probed cells. Per-query candidate set ≈
    * nprobe/K of the corpus — the inverted-file scale shape.
    *
    * The default quantizer TRAINS k-means|| centroids
    * ([[kmeansCentroids]]); pass `centroids` explicitly for a
    * deterministic quantizer (e.g. [[ivfSeedCentroids]], the
    * oracle-reproducible path) or a pre-trained one.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      nCentroids: Int,
      nprobe: Int,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(kmeansCentroids(corpus, idCol, vecCol, nCentroids))
    val assigned = ivfAssign(corpus, idCol, vecCol, cents)
    val qScored = queries.crossJoin(broadcast(cents))
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

  // ---- product quantization: the embedding-compression path. At 100 TB
  // an fp32 corpus rarely fits the budget; PQ codes (m sub-codes of
  // log2(k) bits each) cut a 64-dim vector from 256 bytes to m bytes
  // while keeping ANN-usable geometry.

  /** Deterministic PQ codebooks: for each of the `m` subspaces, the
    * sub-vectors of the `k` lowest-id corpus rows (same seed discipline
    * as ivfSeedCentroids — production swaps in per-subspace k-means,
    * the CODE ASSIGNMENT mechanics are identical and oracle-checked).
    * Returns codebooks(j)(c) = centroid c of subspace j, as doubles.
    */
  def pqSeedCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int): Array[Array[Array[Double]]] = {
    val rows = corpus.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect()
    require(rows.nonEmpty, "pq: empty corpus")
    val dim = rows.head.getSeq[Float](0).length
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { j =>
      rows.map(_.getSeq[Float](0).slice(j * sub, (j + 1) * sub).map(_.toDouble).toArray)
    }
  }

  /** Trained PQ codebooks — the production quantizer: per subspace, a
    * k-means|| fit (MLlib, squared-L2 objective, matching the ADC/code
    * metric) over that subspace's slice of every corpus vector. Seed
    * slices ([[pqSeedCodebooks]]) keep the oracle deterministic; real
    * corpora need trained centroids or within-cluster ADC distances
    * collapse to ties and recall dies (same argument as
    * [[kmeansCentroids]] for IVF).
    *
    * All m subspace slices are materialized in ONE pass over the corpus
    * and cached, so the m fits iterate over an in-memory projection of
    * m×sub doubles per row, not m parquet scans of the full embedding.
    * At 100 TB you would fit on a sampled fraction — pass
    * `corpus.sample(f)`; the codebooks (m·k·sub doubles) are
    * driver-side literals either way, exactly like the IVF centroids.
    */
  def pqTrainedCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      seed: Long = 1L,
      maxIter: Int = 10): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    val dimRow = corpus.select(size(col(vecCol))).head(1)
    require(dimRow.nonEmpty, "pq: empty corpus")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val sub = dim / m
    val feats = corpus.select((0 until m).map { j =>
      org.apache.spark.ml.functions.array_to_vector(
        slice(col(vecCol), j * sub + 1, sub).cast("array<double>")).as(s"__f$j")
    }: _*).cache()
    try {
      Array.tabulate(m) { j =>
        new KMeans().setK(k).setSeed(seed + j).setMaxIter(maxIter)
          .setFeaturesCol(s"__f$j").fit(feats)
          .clusterCenters.map(_.toArray)
      }
    } finally { feats.unpersist(); () }
  }

  /** End-to-end PQ search: code the corpus, then ADC top-k. The default
    * quantizer TRAINS per-subspace k-means ([[pqTrainedCodebooks]]);
    * pass `codebooks` explicitly for a deterministic quantizer
    * ([[pqSeedCodebooks]], the oracle-reproducible path) or a
    * pre-trained one — mirroring [[ivfTopK]]'s contract.
    */
  def pqSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      m: Int,
      nCodes: Int,
      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    // explicit codebooks must agree with (m, nCodes): pqCodes/pqTopK
    // derive both from the books, so a mismatch would silently ignore
    // the parameters instead of searching the intended space
    codebooks.foreach { bs =>
      require(bs.length == m, s"pq: codebooks have m=${bs.length}, expected $m")
      require(bs.forall(_.length == nCodes),
        s"pq: codebooks have ${bs.map(_.length).distinct.mkString("/")} codes, expected $nCodes")
    }
    val books = codebooks.getOrElse(pqTrainedCodebooks(corpus, idCol, vecCol, m, nCodes))
    val codes = pqCodes(corpus, idCol, vecCol, books)
    pqTopK(codes, queries, idCol, vecCol, qIdCol, k, books)
  }

  /** PQ code assignment with ZERO shuffle: per subspace, a slice of the
    * embedding runs through the squared-L2 nearest-centroid kernel
    * (ties → lowest code) against the broadcast codebook — a map-only
    * scan emitting `code0..code{m-1}`, the same plan shape as ivfAssign.
    */
  def pqCodes(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codes = (0 until m).map { j =>
      val sl = slice(col(vecCol), j * sub + 1, sub)
      graft.plans.HashExpressions.nearestCentroidL2(sl, codebooks(j).toSeq).as(s"code$j")
    }
    corpus.select(col(idCol) +: codes: _*)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: per query, an m×k
    * distance table (query sub-vector → every codebook entry) rides the
    * broadcast query frame; scoring a corpus row is then m array
    * lookups summed — the scan reads CODES, never the raw vectors,
    * which is the whole point of PQ at 100 TB (4 bytes/row here vs 256).
    * Smallest approximate L2 wins; ties → lowest id. The only exchange
    * is the final per-query top-k.
    *
    * The distance entries are the same left-assoc Σ(x−c)² fold as
    * pqCodes' kernel (aggregate over zip_with, seed 0.0), which the SQL
    * oracle replicates term-for-term.
    */
  def pqTopK(
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    def l2(qslice: Column, cent: Array[Double]): Column =
      aggregate(
        zip_with(qslice.cast("array<double>"), lit(cent), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, t) => acc + t)
    val dtables = (0 until m).map { j =>
      val qs = slice(col(vecCol), j * sub + 1, sub)
      array(codebooks(j).map(cent => l2(qs, cent)).toIndexedSeq: _*).as(s"__dt$j")
    }
    val qWith = broadcast(queries.select(col(qIdCol) +: dtables: _*))
    val adc = (0 until m).map(j => element_at(col(s"__dt$j"), col(s"code$j") + 1))
      .reduceLeft[Column](_ + _)
    val scored = codes.crossJoin(qWith)
      .select(col(qIdCol), col(idCol), adc.as("adc"))
    val w = Window.partitionBy(qIdCol).orderBy(col("adc"), col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The composite IVF+PQ index frame: (id, cell, code0..code{m-1})
    * in ONE map-only scan — both the nearest-centroid cell kernel and
    * the m per-subspace code kernels run over the same projection with
    * zero shuffle. This is the on-disk artifact of a production vector
    * index (FAISS IndexIVFPQ): ~(8 + m) bytes per row instead of the
    * raw fp32 vector, partitionable/bucketable by cell.
    */
  def ivfPqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val (vecs, cids) = collectCentroids(centroids)
    val cellIdx = graft.plans.HashExpressions.nearestCentroid(col(vecCol), vecs.toSeq)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codes = (0 until m).map { j =>
      val sl = slice(col(vecCol), j * sub + 1, sub)
      graft.plans.HashExpressions.nearestCentroidL2(sl, codebooks(j).toSeq).as(s"code$j")
    }
    corpus.select(col(idCol) +: element_at(array(cids.toSeq: _*), cellIdx + 1).as("cell") +: codes: _*)
  }

  /** IVF+PQ search — the production billion-scale composite: probe the
    * `nprobe` nearest cells per query (cosine over the broadcast
    * centroid frame), then ADC-score ONLY the probed cells' PQ codes.
    * The per-query m×k distance tables ride the broadcast probe frame;
    * the index scan reads (cell, codes) — 8+m bytes/row, never the raw
    * vectors — and the cell equi-join prunes it to ≈ nprobe/K of the
    * corpus per query. Only the final per-query top-k exchanges.
    * Smallest ADC wins; ties → lowest id. Compose with [[pqRerank]]'s
    * stage-2 fetch for exact scores on the shortlist.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      nprobe: Int,
      centroids: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val index = ivfPqIndex(corpus, idCol, vecCol, centroids, codebooks)
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // probed cells per query: nprobe nearest centroids by cosine
    val qScored = queries.crossJoin(broadcast(centroids))
      .select(col(qIdCol), col(vecCol), col("cid"),
        VectorOps.cosine(col(vecCol), col("cvec")).as("ccos"))
    val qw = Window.partitionBy(qIdCol).orderBy(col("ccos").desc, col("cid"))
    def l2(qslice: Column, cent: Array[Double]): Column =
      aggregate(
        zip_with(qslice.cast("array<double>"), lit(cent), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, t) => acc + t)
    val dtables = (0 until m).map { j =>
      val qs = slice(col(vecCol), j * sub + 1, sub)
      array(codebooks(j).map(cent => l2(qs, cent)).toIndexedSeq: _*).as(s"__dt$j")
    }
    val probes = qScored.withColumn("__r", row_number().over(qw)).where(col("__r") <= nprobe)
      .select(col(qIdCol) +: col("cid").as("cell") +: dtables: _*)
    val adc = (0 until m).map(j => element_at(col(s"__dt$j"), col(s"code$j") + 1))
      .reduceLeft[Column](_ + _)
    val scored = index.join(broadcast(probes), "cell")
      .select(col(qIdCol), col(idCol), adc.as("adc"))
    val w = Window.partitionBy(qIdCol).orderBy(col("adc"), col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Two-stage retrieval — PQ-ADC shortlist, exact-cosine rerank: the
    * production billion-scale search shape (FAISS's IndexIVFPQ +
    * refine). Stage 1 scans CODES only ([[pqTopK]], 4 bytes/row) for a
    * `shortlist`-deep candidate list per query; stage 2 fetches raw
    * vectors for ONLY the shortlist rows — the fetch is a broadcast
    * hash join of the tiny (qid, id) shortlist against the corpus, so
    * the vector table is read map-only with the join filter applied at
    * the scan (no corpus shuffle, no full-corpus cosine) — and reranks
    * by exact cosine. Final per-query top-k is the only exchange.
    *
    * ADC quantization error means the true top-k is usually INSIDE a
    * modest shortlist even when stage-1 order is wrong — rerank
    * restores exact order/scores over whatever the shortlist caught.
    * Ties → lowest id, both stages. Returns (qid, rank, id, cos).
    */
  def pqRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      k: Int,
      shortlist: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(shortlist >= k, s"pqRerank: shortlist $shortlist < k $k")
    val codes = pqCodes(corpus, idCol, vecCol, codebooks)
    val short = pqTopK(codes, queries, idCol, vecCol, qIdCol, shortlist, codebooks)
      .select(col(qIdCol), col(idCol))
    val qv = broadcast(queries.select(col(qIdCol), col(vecCol).as("__qv")))
    val exact = corpus.join(broadcast(short), Seq(idCol))
      .join(qv, Seq(qIdCol))
      .select(col(qIdCol), col(idCol), VectorOps.cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
