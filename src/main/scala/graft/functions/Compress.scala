package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Compression-ratio quality signal (the Gopher/RefinedWeb "too
  * compressible = boilerplate, too incompressible = noise" curation
  * filter): deflate each document at a FIXED level and report
  * compressed/raw sizes. Highly repetitive boilerplate compresses far
  * below natural text; encrypted/garbled spans barely compress —
  * thresholding both tails is a standard pre-training cut.
  *
  * No SQL engine exposes deflate, so the oracle is a checked-in
  * GOLDEN (r16): tools/make_compress_golden.py computes the sizes
  * independently via python zlib (byte-size-identical stream format
  * at level 6), SparkEntry.oracleSql inlines them as a VALUES table,
  * and the ScalaTest spec carries the semantics (monotonicity on
  * repetition, determinism, edge contracts). Shape: batched
  * mapPartitions (a Deflater is an imperative native object — the
  * codec pattern shared with multimodal), map-only, no shuffle.
  */
object Compress {

  /** Deflate `text` per row at compression level 6 (the zlib default,
    * pinned explicitly so the signal is stable across JDK defaults).
    */
  def compressionStats(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val idIdx = docs.schema.fieldIndex(idCol)
    val tIdx = docs.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("n_deflate", LongType),
      StructField("ratio", DoubleType)))
    docs.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val raw = if (r.isNullAt(tIdx)) Array.emptyByteArray
          else r.getString(tIdx).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](1024)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        val ratio =
          if (raw.length > 0) total.toDouble / raw.length.toDouble else null
        Row(r.getLong(idIdx), raw.length.toLong, total, ratio)
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
