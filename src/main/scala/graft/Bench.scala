package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup outside the timers: JVM/codegen/FileIndex costs
    // otherwise land on whichever query happens to run first
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    // dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 restricts the run
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // stream_* queries replay the table through a driver-fed
    // MemoryStream (verification harness, ~3s of replay machinery per
    // query at sf0.1) — they gate correctness in Verify, not throughput
    // here
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries.filter { case (n, _) => !n.startsWith("stream_") }
    }
    // deterministic name order: per-query timings stay comparable
    // across rounds as queries are added (Map hash order shifts)
    val ordered = selected.toSeq.sortBy(_._1)
    // one UNTIMED warm-up execution of the first query: whole-stage
    // codegen + JIT of the shared operator paths otherwise land on
    // whichever query sorts first (round 2 measured ~1-2 s of one-time
    // cost polluting its row and every round-over-round delta)
    ordered.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // median of N runs per query: a single local[32] pass has measured
    // ±25-30% noise and one contended round inflated unchanged map-only
    // queries 2-4×. The median of 3 is robust to one bad interval.
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
      .getOrElse(3).max(1)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    def r3(v: Double): String = f"$v%.3f"
    // two artifact shapes from one run:
    //  - side-file: full evidence, INCLUDING per-rep times per query —
    //    round 8's ts_pipeline_full 6.83 s driver anomaly was
    //    unadjudicable because raw reps went only to stderr; now a
    //    polluted round (one slow rep vs all-slow reps) is decidable
    //    from the artifact alone
    //  - stdout: one COMPACT line (medians only, 3dp) printed LAST, so
    //    a tail-capture driver parser sees the whole object (round 8's
    //    tail truncated the FRONT of the long per-query map → parsed
    //    null)
    def jsonLine(results: Seq[(String, Seq[Double])], partial: Boolean,
                 withReps: Boolean): String = {
      def med(ts: Seq[Double]): Double = {
        val s = ts.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }
      val qs = results.map { case (k, ts) => "\"" + k + "\":" + r3(med(ts)) }
        .mkString("{", ",", "}")
      val total = results.map { case (_, ts) => med(ts) }.sum
      val repsJson =
        if (!withReps) ""
        else results.map { case (k, ts) =>
          "\"" + k + "\":[" + ts.map(r3).mkString(",") + "]"
        }.mkString(""","rep_times":{""", ",", "}")
      val tail = if (partial) s""","partial":true,"completed":${results.size},"selected":${ordered.size}""" else ""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$repsJson$tail}"""
    }
    def writeOut(line: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Double])]
    ordered.foreach { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune every
        // feature column, which would benchmark an empty projection
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      val sortedT = times.sorted
      val median =
        if (sortedT.length % 2 == 1) sortedT(sortedT.length / 2)
        else (sortedT(sortedT.length / 2 - 1) + sortedT(sortedT.length / 2)) / 2.0
      // stderr progress: makes a wedged query identifiable mid-run
      System.err.println(f"[bench] $name%-24s $median%8.3f s  " +
        s"(reps: ${times.map(t => f"$t%.2f").mkString(" ")})")
      acc += (name -> times)
      // rewrite the side-file after EVERY query: a driver timeout
      // (round 7 was rc:124 → parsed:null, a whole round with no bench
      // evidence) now leaves a valid partial JSON artifact on disk,
      // flagged "partial" with completed/selected counts
      writeOut(jsonLine(acc.toSeq, partial = true, withReps = true))
    }
    // full evidence (with per-rep times) → side-file only
    writeOut(jsonLine(acc.toSeq, partial = false, withReps = true))
    System.err.println(s"[bench] full artifact (with rep_times): $outFile")
    // compact medians-only line is the LAST stdout output — nothing
    // may print after it or a tail-capturing parser loses the front
    println(jsonLine(acc.toSeq, partial = false, withReps = false))
    spark.stop()
  }
}
