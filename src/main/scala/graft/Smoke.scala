package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: schema probe for the driver-generated test tables. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(5, truncate = false)
    println("user_id cardinality: " + ev.select("user_id").distinct().count())
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    println("embedding dim: " + emb.selectExpr("size(embedding) d").head().getInt(0))
    val doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc.show(3, truncate = 60)
    spark.stop()
  }
}
