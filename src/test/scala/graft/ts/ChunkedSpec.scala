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

  test("chunked centered taylor + leads are value-identical to the unchunked plan") {
    // centered w=7 → hw=3: lookBack >= 3, lookAhead >= 4 (hw+1, the
    // reference's rpos==hw off-by-one must stay a series-end exclusive)
    def centered(d: org.apache.spark.sql.DataFrame, gs: Seq[String], os: Seq[String]) =
      Featurize.featurizeData(d, gs, os, Seq(
        Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(7), Seq("centered"), Seq(None), fillEdges = true),
        Featurize.HorizonTargets(Seq("v"), Seq(2), "wide"),
        Featurize.Lag(Seq("v"), Seq(2))))
    val plain = centered(df, Seq("g"), Seq("ts"))
    val chunked = Chunked.chunked(df, Seq("g"), Seq("ts"), "ts",
      chunkWidth = 25000L, lookBack = 3, lookAhead = 4)(centered)
    assert(chunked.featureNames == plain.featureNames)
    val cols = Seq("g", "ts", "v") ++ plain.featureNames :+ "v_target2"
    def key(r: org.apache.spark.sql.Row) = (r.getInt(0), r.getLong(1))
    def feats(r: org.apache.spark.sql.Row) =
      (3 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    val p = plain.df.select(cols.map(col): _*).collect().map(r => key(r) -> feats(r)).toMap
    val c = chunked.df.select(cols.map(col): _*).collect().map(r => key(r) -> feats(r)).toMap
    assert(c.keySet == p.keySet, "one output row per input row")
    for (k <- p.keySet) assert(c(k) == p(k), s"row $k: ${c(k)} != ${p(k)}")
  }

  test("chunked centered with lookAhead == hw breaks the off-by-one contract (guard)") {
    // documents WHY the contract says hw+1: with only hw look-ahead
    // rows, the last natural row of every mid chunk pattern-matches the
    // reference's never-filled rpos==hw edge and comes back NULL
    def centered(d: org.apache.spark.sql.DataFrame, gs: Seq[String], os: Seq[String]) =
      Featurize.featurizeData(d, gs, os, Seq(
        Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(7), Seq("centered"), Seq(None), fillEdges = true)))
    val plain = centered(df, Seq("g"), Seq("ts"))
    val tight = Chunked.chunked(df, Seq("g"), Seq("ts"), "ts",
      chunkWidth = 25000L, lookBack = 3, lookAhead = 3)(centered)
    val fn = plain.featureNames.head
    val pNulls = plain.df.where(col(fn).isNull).count()
    val tNulls = tight.df.where(col(fn).isNull).count()
    assert(tNulls > pNulls, "insufficient look-ahead must surface as extra edge NULLs")
  }

  test("chunked plan shuffles on (group, chunk): monster keys fan out") {
    val chunked = Chunked.chunkedTrailing(df, Seq("g"), Seq("ts"), "ts",
      chunkWidth = 25000L, overlap = 3)(builder)
    val plan = chunked.df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(g"), plan.take(800))
    assert(plan.contains("__chunk"), "chunk key missing from the exchange:\n" + plan.take(800))
  }
}
