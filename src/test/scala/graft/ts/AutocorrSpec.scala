package graft.ts

import graft.SparkSpec

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  test("autocorr: strongly periodic series has high lag-k ACF at its period") {
    val n = 60
    val df = (0 until n).map(t => (1, t, math.sin(2 * math.Pi * t / 6.0))).toDF("g", "t", "v")
    val acfPeriod = Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK = 6, w = 24)
      .df.orderBy("t").collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    val acfHalf = Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK = 3, w = 24)
      .df.orderBy("t").collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(acfPeriod.take(24 + 6 - 1).forall(_.isEmpty), "gated until w full pairs")
    assert(acfPeriod.last.exists(_ > 0.99), s"period lag ACF ~1, got ${acfPeriod.last}")
    assert(acfHalf.last.exists(_ < -0.99), s"half-period lag ACF ~-1, got ${acfHalf.last}")
  }

  test("zscore: standardized values over full windows, gated before") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1, i, v) }.toDF("g", "t", "v")
    val out = Featurize.zscore(df, "v", Seq("g"), Seq("t"), w = 4)
      .df.orderBy("t").collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(out.take(3).forall(_.isEmpty))
    // window (1,2,3,4): mean 2.5, std ~1.29099 → z(4) ~ 1.1619
    assert(out(3).exists(z => math.abs(z - 1.161895003862225) < 1e-12))
    assert(out(4).exists(_ > 1.4), "outlier flagged with high z")
  }
}
