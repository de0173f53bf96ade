package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Drives a streaming twin to completion over a FINITE input so the
  * driver's DuckDB gate can oracle the streaming operators exactly like
  * their batch counterparts: the batch table is replayed through a
  * [[MemoryStream]] in several micro-batches (state crosses batch
  * boundaries, so this exercises the real incremental path, not a
  * single-batch degenerate), the query runs until the source is
  * drained, and the memory-sink table comes back as a plain DataFrame
  * for the parquet dump.
  *
  * The driver-side `collect` of the input is inherent to the harness —
  * MemoryStream is driver-fed by contract — and scoped to verification:
  * production streams read from a real source via `readStream`, and the
  * operators under test are identical either way.
  */
object StreamRunner {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay `rows` (already in arrival order) through `build` in
    * `nChunks` micro-batches and return the completed sink table.
    * `outputMode` follows the query shape: "append" for
    * flatMapGroupsWithState emitters, "complete" for windowed aggs
    * (emission then doesn't hinge on watermark passage, which a finite
    * replay never achieves for its last window).
    */
  def run[T](
      spark: SparkSession,
      rows: Seq[T],
      nChunks: Int,
      outputMode: String)(build: Dataset[T] => DataFrame)(implicit enc: Encoder[T]): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[T]
    val name = s"graft_stream_sink_${counter.incrementAndGet()}"
    val q = build(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(outputMode).start()
    try {
      val per = math.max(1, (rows.size + nChunks - 1) / nChunks)
      rows.grouped(per).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }
}
