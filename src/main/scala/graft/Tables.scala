package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. `events.ts` has shipped in two physical forms
  * across driver testdata generations: parquet TIMESTAMP(NANOS) (which
  * Spark surfaces as BIGINT nanos under
  * `spark.sql.legacy.parquet.nanosAsLong`) and parquet timestamp[us]
  * (which Spark surfaces as TIMESTAMP / TIMESTAMP_NTZ). `events()`
  * normalizes BOTH to the same `ts_us: long` (epoch microseconds), the
  * finest precision DuckDB and Spark agree on; the DuckDB oracle uses
  * `epoch_us(ts)` which yields identical int64s for either physical
  * type. Schema-adaptive instead of config-pinned so a testdata
  * regeneration cannot silently take out every events-based query (the
  * round-10 failure: `ts_ns div 1000` against a timestamp column was an
  * AnalysisException on all 65 events-based ts/stream queries).
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

  /** events with `ts` replaced by `ts_us: long` (epoch microseconds),
    * whatever the physical parquet type of `ts`:
    *  - BIGINT (legacy nanosAsLong surface of TIMESTAMP(NANOS)):
    *    `div 1000` floors to µs, matching DuckDB's nanos→µs truncation.
    *  - TIMESTAMP: `unix_micros` is the exact epoch-µs payload.
    *  - TIMESTAMP_NTZ: cast to TIMESTAMP first; the session timezone is
    *    pinned to UTC everywhere (builder + javaOptions), so the naive
    *    value maps to the same µs DuckDB's `epoch_us` computes.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampType    => unix_micros(col("ts"))
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unexpected physical type $other")
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The checked-in real-text corpus (see SparkEntry.realCorpusDir's
    * doc): ONE small parquet file → ONE input partition, but its docs
    * run to 100k chars, so r18's gate serialized ~6 min of per-doc text
    * work on a single core (real_dedup_substring 246 s single-task).
    */
  val realCorpusDir = "/root/repo/src/test/resources/real_corpus"

  /** The checked-in REAL time-series fixture (tools/make_real_events.py):
    * the reference library's own demo dataset — 51 US locations × 274
    * daily COVID hospitalization observations — in the synth `events`
    * schema, so the featurize/asof/resample surface twins onto genuine
    * grouped time-series data the same way the curation path twins onto
    * the real text corpus. 14k rows: no spread needed (every ts query
    * shuffles on the series key immediately).
    */
  val realEventsDir = "/root/repo/src/test/resources/real_events"

  /** documents, with the real corpus spread over the executor threads:
    * one deterministic round-robin exchange (sortBeforeRepartition is
    * on by default) buys per-doc parallelism for every real_* twin.
    * Synthetic sf* documents are also single files but their docs are
    * tiny and their queries shuffle immediately anyway — only the real
    * corpus pays the extra exchange.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "documents")
    if (sfDir == realCorpusDir) df.repartition(32) else df
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
