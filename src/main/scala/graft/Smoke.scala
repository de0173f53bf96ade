package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: physical-plan audit for the headline queries. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("ts_pipeline", "ts_taylor_centered", "q3_join")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: operator lines only, truncate expressions
      plan.linesIterator.map(_.take(160)).foreach(println)
    }
    spark.stop()
  }
}
