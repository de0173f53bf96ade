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
    // dir-bound oracles: text_compress_ratio's golden must match the
    // corpus being gated (absent golden → rows-only, not a hard fail)
    val json = SparkEntry.oracleSqlFor(sfDir)
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Stall-survivable ordering (round 7 lost its whole correctness file
    // to a host stall + timeout): Map hash order interleaved ~3-minute
    // streaming replays among the batch queries, so a timeout zeroed
    // everything. Deterministic name order, ALL batch queries first,
    // stream_* last — a timeout now preserves the full batch sweep.
    // Failure visibility (round-10 advice): a failed query used to
    // leave NO trace in the driver's artifact — its parquet dump is
    // simply absent, and CORRECTNESS_r10 read as "all pass" while 65
    // queries went unverified. Every failure is now recorded in
    // verify_errors.json (rewritten after each failure, in outDir for
    // the driver AND at the repo root so it rides the round-end
    // commit), with the exception class + first message lines.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def writeErrors(): Unit = {
      val json = errors
        .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
        .mkString("{", ",", "}")
      Seq(s"$outDir/verify_errors.json", "VERIFY_ERRORS.json").foreach { p =>
        try Files.writeString(Paths.get(p), json)
        catch { case e: Throwable =>
          System.err.println(s"[verify] write $p failed: ${e.getMessage}") }
      }
    }
    writeErrors() // clean slate: stale failures from a prior run can't linger
    // Gate-cost visibility (judge r18 item 4): the r18 round was voided
    // by a gate timeout with NO trace of which query ate the wall.
    // verify_timings.json (rewritten after EVERY query, like the error
    // file) records per-query dump seconds — a blown gate now names its
    // hotspot even if the run is killed mid-sweep.
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def writeTimings(): Unit = {
      val json = timings
        .map { case (k, v) => s"${jsonEscape(k)}: ${"%.3f".format(v)}" }
        .mkString("{", ",", "}")
      try Files.writeString(Paths.get(s"$outDir/verify_timings.json"), json)
      catch { case e: Throwable =>
        System.err.println(s"[verify] write timings failed: ${e.getMessage}") }
    }
    var ok = 0
    val names = Verify.ordered(SparkEntry.queries.keys.toSeq)
      .filter(name => only.isEmpty || only(name))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        ok += 1
      } catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ").take(400)
        System.err.println(s"[verify] $name failed: $msg")
        errors += (name -> msg)
        writeErrors()
      } finally {
        timings += (name -> (System.nanoTime() - t0) / 1e9)
        writeTimings()
        // builder-persisted intermediates (pipeline_e2e's kept corpus,
        // the gram/signature caches in Dedup) are per-query: drop them
        // now instead of letting cached relations accumulate across the
        // 234-query sweep until the ContextCleaner gets around to it
        spark.catalog.clearCache()
      }
    }
    System.err.println(s"[verify] done: $ok/${names.size} dumped, ${errors.size} failed" +
      (if (errors.nonEmpty) s" (${errors.keys.mkString(", ")})" else ""))
    spark.stop()
  }
}
