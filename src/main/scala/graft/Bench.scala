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
    def jsonLine(results: Seq[(String, Double)], partial: Boolean): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val tail = if (partial) s""","partial":true,"completed":${results.size},"selected":${ordered.size}""" else ""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$tail}"""
    }
    def writeOut(line: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    ordered.foreach { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune every
        // feature column, which would benchmark an empty projection
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2.0
      // stderr progress (stdout stays the one-line JSON contract):
      // makes a wedged query identifiable from the log mid-run, and
      // the raw reps expose outliers the median hides
      System.err.println(f"[bench] $name%-24s $median%8.3f s  " +
        s"(reps: ${times.map(t => f"$t%.2f").mkString(" ")})")
      acc += (name -> median)
      // rewrite the side-file after EVERY query: a driver timeout
      // (round 7 was rc:124 → parsed:null, a whole round with no bench
      // evidence) now leaves a valid partial JSON artifact on disk,
      // flagged "partial" with completed/selected counts
      writeOut(jsonLine(acc.toSeq, partial = true))
    }
    val line = jsonLine(acc.toSeq, partial = false)
    println(line)
    // the bare JSON line also goes to the side-file: the driver's stdout
    // parser chokes on the sbt-prefixed tail, leaving "parsed": null
    writeOut(line)
    spark.stop()
  }
}
