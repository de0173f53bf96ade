package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of named queries
  * (all batch queries when none given) against a testdata dir —
  * `runMain graft.Explain <sfDir> [query ...]`. This is how the §5
  * plan audits in SURVEY.md are produced: grep the output for
  * Exchange / WholeStageCodegen / PushedFilters / ReadSchema and
  * check each operator's shape claim against what Catalyst actually
  * planned.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Set[String] = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => if (only.isEmpty) !n.startsWith("stream_") else only(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable =>
          println(s"EXPLAIN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
