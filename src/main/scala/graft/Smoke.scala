package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Dev scratch: stage-by-stage timing of the minhash pipeline. */
object Smoke {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
    time("count docs")(println(docs.count()))
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    time("tokens")(println(toks.selectExpr("sum(size(t))").head()))
    val sh = docs.select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("s"))
    time("shingles")(println(sh.selectExpr("sum(size(s))").head()))
    val hs = docs.select(col("doc_id"), TextOps.shingleHashes(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("hs"))
    time("hashes")(println(hs.selectExpr("sum(size(hs))").head()))
    val one = hs.select(col("doc_id"), TextOps.minhashSig(col("hs"), TextOps.minhashParams(1)).head.as("mh0"))
    time("1 perm")(println(one.selectExpr("sum(mh0)").head()))
    val sig = graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 3, TextOps.minhashParams(16))
    time("16 perms via minhashSignatures")(println(sig.selectExpr("sum(mh0)").head()))
    spark.stop()
  }
}
