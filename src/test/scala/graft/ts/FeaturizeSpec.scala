package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 0L, 2.0), (1, 1L, 4.0), (1, 2L, 6.0), (1, 3L, 100.0),
    (2, 0L, 5.0), (2, 1L, 5.0))
    .toDF("g", "t", "v")

  test("rollStats: min/max/std over trailing windows with full-window gating") {
    val res = Featurize.rollStats(df, Seq("v"), Seq("g"), Seq("t"), Seq(3))
    val rows = res.df.filter($"g" === 1).orderBy("t")
      .select("v_rollmin_w3", "v_rollmax_w3", "v_rollstd_w3").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0), "first w-1 rows gated to null")
    assert(rows(2).getDouble(0) == 2.0 && rows(2).getDouble(1) == 6.0)
    assert(math.abs(rows(2).getDouble(2) - 2.0) < 1e-12) // std of 2,4,6
    assert(rows(3).getDouble(1) == 100.0)
  }

  test("interpolateLinear: bracketed gaps linear, trailing ffill, leading null") {
    val g = Seq((1, 0L, None), (1, 1L, Some(10.0)), (1, 2L, None), (1, 3L, None),
      (1, 4L, Some(40.0)), (1, 5L, None))
      .toDF("g", "t", "v")
    val out = TimeOps.interpolateLinear(g, Seq("g"), "t", "v", "iv")
      .orderBy("t").select("iv").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(40.0)))
  }

  test("trainTestTensors: per-group (T,P) arrays + x_T at max order key") {
    val feats = Featurize.lagFeatures(df, Seq("v"), Seq("g"), Seq("t"), Seq(1))
    val tens = Featurize.trainTestTensors(feats.df, Seq("v_lag1"), "v", Seq("g"), "t")
    val r1 = tens.filter($"g" === 1).head()
    assert(r1.getSeq[Long](r1.fieldIndex("t")).toList == List(1L, 2L, 3L), "first row dropped by na.drop on lag")
    val xs = r1.get(r1.fieldIndex("x")).asInstanceOf[scala.collection.Seq[Any]]
      .map(_.asInstanceOf[scala.collection.Seq[Double]].toList).toList
    assert(xs == List(List(2.0), List(4.0), List(6.0)))
    assert(r1.getSeq[Double](r1.fieldIndex("y")).toList == List(4.0, 6.0, 100.0))
    assert(r1.getSeq[Double](r1.fieldIndex("x_T")).toList == List(6.0), "x_T uses features at global max t")
    // group 2 has no rows at global max t=3 → x_T null, train side present
    val r2 = tens.filter($"g" === 2).head()
    assert(r2.isNullAt(r2.fieldIndex("x_T")))
  }

  test("lagFeatures(windowSize): all lags 1..N when no explicit list (featurize.py:220)") {
    val res = Featurize.lagFeatures(df, Seq("v"), Seq("g"), Seq("t"), windowSize = 3)
    assert(res.featureNames == Seq("v_lag1", "v_lag2", "v_lag3"))
    val r = res.df.filter($"g" === 1 && $"t" === 3).head()
    assert(r.getDouble(r.fieldIndex("v_lag1")) == 6.0)
    assert(r.getDouble(r.fieldIndex("v_lag3")) == 2.0)
  }

  test("featurizeData Custom step composes with built-ins and accumulates names") {
    import org.apache.spark.sql.functions._
    val res = Featurize.featurizeData(df, Seq("g"), Seq("t"), Seq(
      Featurize.Lag(Seq("v"), Seq(1)),
      Featurize.Custom { (d, groups, orders) =>
        val win = Featurize.seriesWindow(groups, orders)
        FeatureResult(d.withColumn("v_cumsum", sum("v").over(
          win.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))),
          Seq("v_cumsum"))
      }))
    assert(res.featureNames == Seq("v_lag1", "v_cumsum"))
    val r = res.df.filter($"g" === 1 && $"t" === 3).head()
    assert(r.getDouble(r.fieldIndex("v_cumsum")) == 112.0)
  }

  test("trainTestTensors composes lazily (no eager driver job) and toLocalTensors hands off") {
    val feats = Featurize.lagFeatures(df, Seq("v"), Seq("g"), Seq("t"), Seq(1))
    // composing the operator must not launch a Spark job (.head() used
    // to force one mid-operator); composition after it must stay lazy
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val tens = Featurize.trainTestTensors(feats.df, Seq("v_lag1"), "v", Seq("g"), "t")
      .filter($"g" === 1)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "operator composition launched a Spark job")
    val local = Featurize.toLocalTensors(tens, Seq("g"))
    assert(local.length == 1)
    val g1 = local.head
    assert(g1.key == Seq(1) && g1.t.toList == List(1L, 2L, 3L))
    assert(g1.x.map(_.toList).toList == List(List(2.0), List(4.0), List(6.0)))
    assert(g1.y.toList == List(4.0, 6.0, 100.0))
    assert(g1.xT.toList == List(6.0))
  }

  test("fused feature block flushes when a feature reads an earlier feature's output") {
    // Rollmean over v_lag1 (produced by the previous Lag step in the
    // same would-be fused block) must see the materialized column
    val res = Featurize.featurizeData(df, Seq("g"), Seq("t"), Seq(
      Featurize.Lag(Seq("v"), Seq(1)),
      Featurize.Rollmean(Seq("v_lag1"), Seq(2), Some(2))))
    assert(res.featureNames == Seq("v_lag1", "v_lag1_rollmean_w2"))
    val r = res.df.filter($"g" === 1 && $"t" === 3).head()
    // lag1 at t=3,2 are 6.0, 4.0 -> mean 5.0
    assert(r.getDouble(r.fieldIndex("v_lag1_rollmean_w2")) == 5.0)
  }

  test("GraftFunctions SQL registration: graft_simhash32/graft_minhash16 usable from SQL") {
    graft.plans.GraftFunctions.register(spark)
    val out = Seq(("a b c d e")).toDF("text")
      .createOrReplaceTempView("gf_docs")
    val row = spark.sql(
      """select graft_simhash32(transform(split(text, ' '),
        |         t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % 4294967296)) as sh,
        |       graft_minhash16(transform(split(text, ' '),
        |         t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % 2147483647)) as mh
        |from gf_docs""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](row.fieldIndex("mh")).size == 16)
  }

  test("NaN source values are missing in EVERY frame encoding (bare, bare-NaN, wrapped)") {
    // pandas semantics: NaN IS the missing value. The same series must
    // produce identical features whether the block reads one column
    // (bare/bare-NaN frames) or several (wrapped array frame) —
    // round-8 advisory flagged the divergence.
    val nan = Double.NaN
    val d = Seq(
      (1, 0L, 2.0, 1.0), (1, 1L, nan, 1.0), (1, 2L, 6.0, 1.0),
      (1, 3L, 8.0, 1.0), (1, 4L, nan, 1.0), (1, 5L, 12.0, 1.0))
      .toDF("g", "t", "v", "w")
    val feats = Seq(
      Featurize.Rollmean(Seq("v"), Seq(3)),
      Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(3), Seq("trailing"), Seq(None), fillEdges = false))
    // single-column block → bare-NaN fused frame
    val single = Featurize.featurizeData(d, Seq("g"), Seq("t"), feats)
    // add a w-feature so the block reads two columns → wrapped frame
    val multi = Featurize.featurizeData(d, Seq("g"), Seq("t"),
      feats :+ Featurize.Rollmean(Seq("w"), Seq(2)))
    // roll-only single-column path (compacted bare frame, no taylor)
    val bareRoll = Featurize.featurizeData(d, Seq("g"), Seq("t"),
      Seq(Featurize.Rollmean(Seq("v"), Seq(3))))
    def vals(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.orderBy("t").select(cols.map(col): _*).collect().map(r =>
        cols.indices.map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i))).toSeq).toSeq
    val vCols = single.featureNames
    assert(vals(single.df, vCols) == vals(multi.df, vCols),
      "bare-NaN and wrapped frames must agree on NaN input")
    assert(vals(bareRoll.df, Seq("v_rollmean_w3")) == vals(single.df, Seq("v_rollmean_w3")),
      "compacted bare frame must agree too")
    // and NaN really is skipped, not folded: window [2, NaN, 6] with
    // min_periods=3 has only 2 usable values → null; no NaN leaks out
    val ms = vals(single.df, Seq("v_rollmean_w3")).flatten.flatten
    assert(!ms.exists(_.isNaN), s"no NaN may survive the folds: $ms")
  }
}
