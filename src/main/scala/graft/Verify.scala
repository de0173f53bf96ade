package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * Object-level (not inside main) so VerifyToolingSpec can pin it. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Gate execution order: deterministic (name-sorted), with every
    * stream_* query AFTER every batch query. Streaming replays cost
    * ~minutes each through the MemoryStream harness; putting them last
    * means a driver timeout still leaves the complete batch sweep on
    * disk instead of an empty round (the round-7 failure mode). */
  def ordered(names: Seq[String]): Seq[String] = {
    val (stream, batch) = names.partition(_.startsWith("stream_"))
    batch.sorted ++ stream.sorted
  }

  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir). Extra args = local-dev query
    // subset filter (tools/local_verify.py) — the driver never passes it.
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json FIRST: it costs nothing to produce, and the driver
    // needs it to score whatever parquet dumps survive a timeout.
    val json = SparkEntry.oracleSql
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Stall-survivable ordering (round 7 lost its whole correctness file
    // to a host stall + timeout): Map hash order interleaved ~3-minute
    // streaming replays among the batch queries, so a timeout zeroed
    // everything. Deterministic name order, ALL batch queries first,
    // stream_* last — a timeout now preserves the full batch sweep.
    Verify.ordered(SparkEntry.queries.keys.toSeq)
      .filter(name => only.isEmpty || only(name))
      .foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
