package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}

/** Deduplication family for LLM training-data curation (SURVEY.md §2
  * rows 20-24). Shared shape: compute a per-doc key/signature
  * (map-only), shuffle once on the key (or LSH band) to find candidate
  * groups, resolve each doc to its smallest-id duplicate. At 100 TB the
  * only shuffled payload is (key, doc_id) pairs — never the text.
  */
object Dedup {

  /** Exact dedup on normalized text. Returns `doc_id, group_size,
    * dup_of` where dup_of is the smallest doc_id sharing the text (null
    * for group representatives).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("__k")
    docs
      .select(col(idCol), TextOps.normalize(col(textCol)).as("__k"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("min_id", min(col(idCol)).over(w))
      .withColumn("dup_of", when(col("min_id") < col(idCol), col("min_id")))
      .select(idCol, "group_size", "dup_of")
  }

  /** MinHash signature frame: doc_id, mh0..mh{k-1} (null when the doc
    * has fewer tokens than the shingle size).
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      params: Seq[(Long, Long)]): DataFrame = {
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), shingleSize)
    val sigs = TextOps.minhashSig(sh, params).zipWithIndex.map { case (c, i) => c.as(s"mh$i") }
    docs.select(col(idCol) +: sigs: _*)
  }

  /** LSH banding on a signature frame: rows (doc_id, band_idx,
    * band_key) where band_key concatenates `rowsPerBand` consecutive
    * minhash values. Docs sharing any (band_idx, band_key) are
    * candidate near-duplicates.
    */
  def lshBands(sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val key = concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      struct(lit(b).as("band_idx"), key.as("band_key"))
    }
    // docs below the shingle size have all-null signatures (concat_ws
    // would silently turn those into colliding "" keys) — drop them here
    sig.where(col("mh0").isNotNull)
      .select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_key"))
  }

  /** doc_id → smallest banded buddy (null if none): the dedup verdict.
    * Shuffle cost: one exchange on band_key; candidate pair blow-up is
    * bounded by band selectivity (tune rowsPerBand for the corpus).
    */
  def minhashDupOf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, shingleSize, TextOps.minhashParams(k))
    val bands = lshBands(sig, idCol, k, rowsPerBand)
    val a = bands.as("a")
    val b = bands.as("b")
    val buddies = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col(s"b.$idCol") < col(s"a.$idCol"))
      .groupBy(col(s"a.$idCol").as(idCol))
      .agg(min(col(s"b.$idCol")).as("dup_of"))
    docs.select(col(idCol)).join(buddies, Seq(idCol), "left")
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs sharing at
    * least one shingle; `threshold` filters the verdict. The join key
    * is the (distinct) shingle, so shuffle payload is (shingle hash,
    * doc_id) — 100 TB-safe as long as stop-shingles are capped
    * (maxShingleFreq guards frequency blow-up).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxShingleFreq: Long = 1000L): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(TextOps.shingles(TextOps.tokens(col(textCol)), shingleSize)).as("sh"))
      .distinct()
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val filtered = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("freq")).where(col("freq") <= maxShingleFreq),
      Seq("sh"))
    val pairs = filtered.as("a").join(filtered.as("b"),
        col("a.sh") === col("b.sh") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(counts.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** SimHash signatures + near-dup verdict: byte-banded candidate join,
    * verified by hamming distance on the 32-bit signature.
    */
  def simhashDupOf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol), TextOps.simhash32(TextOps.tokens(col(textCol))).as("simhash"))
    val bands = sig.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"), shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("band_key"))
      }: _*)).as("band"))
      .select(col(idCol), col("simhash"), col("band.band_idx"), col("band.band_key"))
    val buddies = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col(s"b.$idCol") < col(s"a.$idCol"))
      .where(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxHamming)
      .groupBy(col(s"a.$idCol").as(idCol))
      .agg(min(col(s"b.$idCol")).as("dup_of"))
    sig.join(buddies, Seq(idCol), "left").select(idCol, "simhash", "dup_of")
  }

  /** Embedding near-dup pairs: cosine >= threshold. `bucketed=true`
    * restricts the pair join to matching LSH buckets (the 100 TB path);
    * false brute-forces (oracle-friendly on subsamples).
    */
  def embeddingCosinePairs(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bucketed: Boolean = false,
      planes: Seq[Array[Double]] = VectorOps.lshPlanes(8, 64)): DataFrame = {
    val base =
      if (bucketed) embs.select(col(idCol), col(vecCol), VectorOps.lshBucket(col(vecCol), planes).as("__b"))
      else embs.select(col(idCol), col(vecCol), lit(0L).as("__b"))
    val pairs = base.as("a").join(base.as("b"),
      col("a.__b") === col("b.__b") && col(s"a.$idCol") < col(s"b.$idCol"))
    pairs
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        VectorOps.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
