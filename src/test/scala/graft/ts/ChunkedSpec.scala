package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkedSpec extends SparkSpec {
  import spark.implicits._

  // two series, 200 rows each, ts spaced 1000 apart → 25 rows per chunk
  private lazy val df = (for (g <- Seq(1, 2); i <- 0 until 200)
    yield (g, i * 1000L, math.sin(i * 0.37) * 10 + g)).toDF("g", "ts", "v")

  private def builder(d: org.apache.spark.sql.DataFrame, gs: Seq[String], os: Seq[String]) =
    Featurize.rollmean(d, Seq("v"), gs, os, Seq(4))
      .andThen(x => Featurize.lagFeatures(x, Seq("v"), gs, os, Seq(1, 3)))

  test("chunked trailing features are value-identical to the unchunked plan") {
    val plain = builder(df, Seq("g"), Seq("ts"))
    val chunked = Chunked.chunkedTrailing(df, Seq("g"), Seq("ts"), "ts",
      chunkWidth = 25000L, overlap = 3)(builder)
    assert(chunked.featureNames == plain.featureNames)
    def key(r: org.apache.spark.sql.Row) = (r.getInt(0), r.getLong(1))
    def feats(r: org.apache.spark.sql.Row) =
      (3 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    val cols = Seq("g", "ts", "v") ++ plain.featureNames
    val p = plain.df.select(cols.map(col): _*).collect().map(r => key(r) -> feats(r)).toMap
    val c = chunked.df.select(cols.map(col): _*).collect().map(r => key(r) -> feats(r)).toMap
    assert(c.keySet == p.keySet, "one output row per input row")
    for (k <- p.keySet) assert(c(k) == p(k), s"row $k: ${c(k)} != ${p(k)}")
  }

  test("chunked plan shuffles on (group, chunk): monster keys fan out") {
    val chunked = Chunked.chunkedTrailing(df, Seq("g"), Seq("ts"), "ts",
      chunkWidth = 25000L, overlap = 3)(builder)
    val plan = chunked.df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(g"), plan.take(800))
    assert(plan.contains("__chunk"), "chunk key missing from the exchange:\n" + plan.take(800))
  }
}
