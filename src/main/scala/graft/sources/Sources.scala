package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers encoding the layout decisions that matter at
  * 100 TB: explicit schemas (no inference scans), partitioned +
  * optionally bucketed writes so downstream joins/windows on the
  * bucket key skip their exchange, and a file-watch streaming reader.
  */
object Sources {

  /** Batch parquet read. Explicit schema skips the footer-sampling
    * inference job — on a million-file table that is its own win.
    */
  def parquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).parquet(path)
  }

  /** CSV with a REQUIRED schema: schema inference reads the data twice
    * and types drift per-file; never acceptable at scale.
    */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-partitioned parquet write: `partitionCols` become directory
    * partitions (pruned by Catalyst on read).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table: co-locates rows by `bucketCol` so joins
    * and window partitions on that key read pre-shuffled data — the
    * persisted form of "pay the series shuffle once".
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int, sortCol: Option[String]): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Streaming file source over a directory (the batch schema is
    * mandatory for streams).
    */
  def streamParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}
