package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 rows 31-32): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature-extraction as BATCHED
  * per-partition kernels.
  *
  * The actual media decoding is STUBBED (this container has no image/
  * audio libraries): `decodeStub` derives deterministic fake
  * width/height/duration from the payload's md5. Everything around the
  * stub — binary schema, batch shape, partition-level iteration,
  * column plumbing — is the real production shape: swap `fakeMeta` for
  * an opencv/ffmpeg call and nothing else changes.
  */
object Multimodal {

  /** Attach a binary payload column (here derived from text — the test
    * corpus has no true media column; at 100 TB this is your parquet
    * `binary` column read as-is).
    */
  def withBinary(df: DataFrame, srcCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, encode(col(srcCol), "UTF-8"))

  /** Declarative fake-decode metadata: deterministic functions of the
    * payload bytes, codegen-friendly (no UDF). Mirrors the DuckDB twin
    * in SparkEntry exactly.
    */
  def fakeMeta(payload: Column): (Column, Column, Column, Column) = {
    val h = conv(substring(md5(payload), 1, 15), 16, 10).cast("long")
    val nBytes = length(payload).cast("long")
    // power-of-two masks/shifts only: h is up to 2^60, double division
    // would lose low bits
    val width = lit(16L) + h.bitwiseAND(lit(1023L))
    val height = lit(16L) + shiftright(h, 10).bitwiseAND(lit(1023L))
    (nBytes, width, height, lit(1L) + shiftright(nBytes, 12))
  }

  private val stubSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feat", ArrayType(FloatType))))

  /** Batched per-partition "decoder": pulls `batchSize` payloads at a
    * time (the shape a GPU/native decoder wants), emits a fixed-width
    * float feature vector per payload. The ??? -equivalent decode is
    * `fakeFeature` — clearly-marked deterministic stand-in.
    */
  def decodeStub(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real impl: hand `batch.map(_.getAs[Array[Byte]](pIdx))` to the
        // native decoder in one call; here: deterministic fake features.
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](pIdx)
          Row(r.getLong(idIdx), bytes.length, fakeFeature(bytes))
        }
      }
    }(org.apache.spark.sql.Encoders.row(stubSchema))
  }

  /** STUB: stands in for image/audio feature extraction. */
  private def fakeFeature(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](4)
    var i = 0
    while (i < bytes.length) { out(i % 4) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    out
  }

  /** Deterministic pseudo-embedding from per-frame content hashes:
    * dimension j is the scaled 60-bit hash of frame j's md5 — a
    * SQL-twinnable stand-in for a real visual/audio encoder. The
    * surrounding plumbing (fixed-width float vector per payload,
    * flowing into LSH buckets / cosine top-k) is the production
    * multimodal-similarity shape; swap the hash for an encoder call
    * and nothing downstream changes.
    */
  def frameEmbedding(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      dims: Int,
      frameChars: Int): DataFrame = {
    val es = (0 until dims).map { j =>
      val fm = md5(col(srcCol).substr(lit(j * frameChars + 1), lit(frameChars)))
      val h = conv(substring(fm, 1, 15), 16, 10).cast("long")
      ((pmod(h, lit(10001L)).cast("double") / 10000.0) - 0.5).cast("float").as(s"e$j")
    }
    df.select(col(idCol) +: es: _*)
  }

  /** Fixed-width frame sampling over a payload, every `every`-th frame
    * — the video-frame-subsampling shape as pure relational ops
    * (sequence + explode + substr), no UDF.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      frameChars: Int,
      every: Int): DataFrame = {
    val n = expr(s"(length($srcCol) + ${frameChars - 1}) div $frameChars")
    df.select(col(idCol), col(srcCol), explode(sequence(lit(0L), n - 1)).as("frame_idx"))
      .where(pmod(col("frame_idx"), lit(every.toLong)) === 0)
      .select(col(idCol), col("frame_idx"),
        md5(col(srcCol).substr(col("frame_idx") * frameChars + 1, lit(frameChars))).as("frame_md5"))
  }
}
