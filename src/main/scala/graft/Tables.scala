package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. `events.ts` is written by the driver as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright;
  * we read it via `spark.sql.legacy.parquet.nanosAsLong` and expose it
  * as `ts_ns` (epoch nanoseconds, BIGINT). The DuckDB oracle mirrors
  * this with `epoch_ns(ts) as ts_ns`, so both engines operate on the
  * same int64 — no timestamp-unit ambiguity in the hash compare.
  */
object Tables {
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.binaryAsString", "false")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` replaced by `ts_us: long` (epoch microseconds).
    * Microseconds, not nanos: DuckDB's parquet reader truncates
    * TIMESTAMP(NANOS) to µs, so µs is the finest precision both engines
    * agree on. `ts_ns div 1000` floors, matching DuckDB's truncation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events").withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts_ns div 1000"))
      .drop("ts_ns")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
