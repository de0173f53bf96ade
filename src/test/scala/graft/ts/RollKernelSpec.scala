package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel fold paths must be BIT-identical to the Column-expression
  * forms (whose DuckDB oracles mirror the same folds) — including
  * group-edge partial windows and, for rollmean/rollstats/zscore,
  * NULL values inside the window (skipped array elements ≡ the
  * expressions' coalesce(x,0) + non-null count).
  */
class RollKernelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (for {
    (g, n) <- Seq((0, 3), (1, 25), (2, 60))
    i <- 0 until n
  } yield (g, i, math.sin(i * 0.7) * 7 + 0.2 * i + g)).toDF("g", "t", "v")

  // same series with nulls sprinkled in
  private lazy val dfNull = df.withColumn("v", when(pmod($"t", lit(7)) === 3, lit(null)).otherwise($"v"))

  private def cmp(e: FeatureResult, k: FeatureResult, clue: String): Unit = {
    assert(e.featureNames == k.featureNames, clue)
    val cols = Seq("g", "t") ++ e.featureNames
    def m(r: FeatureResult) = r.df.select(cols.map(col): _*).collect()
      .map(row => (row.getInt(0), row.getInt(1)) ->
        (2 until row.length).map(i => if (row.isNullAt(i)) None else Some(row.getDouble(i)))).toMap
    val em = m(e); val km = m(k)
    assert(em.keySet == km.keySet, clue)
    for (key <- em.keySet) assert(em(key) == km(key), s"$clue $key: ${em(key)} vs ${km(key)}")
  }

  test("rollmean kernel == expressions (with nulls and minPeriods)") {
    for (d <- Seq(df, dfNull); mp <- Seq(None, Some(2)))
      cmp(Featurize.rollmean(d, Seq("v"), Seq("g"), Seq("t"), Seq(5, 9), mp, useKernel = false),
        Featurize.rollmean(d, Seq("v"), Seq("g"), Seq("t"), Seq(5, 9), mp, useKernel = true), s"mp=$mp")
  }

  test("rollStats kernel == expressions (with nulls)") {
    for (d <- Seq(df, dfNull))
      cmp(Featurize.rollStats(d, Seq("v"), Seq("g"), Seq("t"), Seq(7), None, useKernel = false),
        Featurize.rollStats(d, Seq("v"), Seq("g"), Seq("t"), Seq(7), None, useKernel = true), "stats")
  }

  test("zscore kernel == expressions (with nulls)") {
    for (d <- Seq(df, dfNull))
      cmp(Featurize.zscore(d, "v", Seq("g"), Seq("t"), 7, useKernel = false),
        Featurize.zscore(d, "v", Seq("g"), Seq("t"), 7, useKernel = true), "z")
  }

  test("autocorr kernel == expressions (null-free)") {
    cmp(Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK = 2, w = 9, useKernel = false),
      Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK = 2, w = 9, useKernel = true), "acf")
  }

  test("rollMoments: symmetric windows have ~0 skew; uniform kurtosis is negative") {
    // strictly symmetric repeating pattern -> every full window of 8
    // holds the same symmetric multiset -> skew exactly ~0
    val pat = Seq(-3.0, -1.0, 1.0, 3.0)
    val d = (0 until 32).map(i => (1, i, pat(i % 4))).toDF("g", "t", "v")
    val res = Featurize.rollMoments(d, "v", Seq("g"), Seq("t"), w = 8)
    val rows = res.df.orderBy("t").select("v_skew_w8", "v_kurt_w8").collect()
    assert(rows.take(7).forall(_.isNullAt(0)), "first w-1 rows gated to null")
    rows.drop(7).foreach { r =>
      assert(math.abs(r.getDouble(0)) < 1e-9, s"skew ${r.getDouble(0)}")
      assert(r.getDouble(1) < 0.0, "flat-ish multiset has negative excess kurtosis")
    }
  }

  test("ewmaTruncated kernel == expressions (null-free)") {
    def run(k: Boolean) = FeatureResult(
      TimeOps.ewmaTruncated(df, "v", Seq("g"), Seq("t"), 0.3, 16, "e", useKernel = k), Seq("e"))
    cmp(run(false), run(true), "ewma")
  }
}
