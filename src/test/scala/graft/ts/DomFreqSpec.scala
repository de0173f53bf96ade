package graft.ts

import graft.SparkSpec

class DomFreqSpec extends SparkSpec {
  import spark.implicits._

  test("periodogramTopK: pure sine at an exact bin dominates") {
    val w = 16
    val k0 = 4
    val x = Array.tabulate(w)(t => math.sin(2 * math.Pi * k0 * t / w))
    val top = DomFreq.periodogramTopK(x, fs = 1.0, k = 3)
    assert(math.abs(top(0) - k0.toDouble / w) < 1e-12, s"dom freq ${top(0)} != ${k0.toDouble / w}")
    // dominant bin carries essentially all power: logpow gap is large
    assert(top(3) - top(4) > 3.0)
  }

  test("periodogramTopK: tie-break by bin index is deterministic (constant series)") {
    val top = DomFreq.periodogramTopK(Array.fill(8)(3.0), fs = 1.0, k = 3)
    assert(top(0) == 0.0 && top(1) == 0.125 && top(2) == 0.25)
    assert(top.drop(3).forall(_ == Double.NegativeInfinity))
  }

  test("domfreq over grouped series: full padded windows, sine detected per group") {
    val w = 15
    // period-5 sine → frequency 0.2 = bin 3 of 15
    val rows = for (g <- Seq(1, 2); t <- 0 until 60)
      yield (g, t, math.sin(2 * math.Pi * t / 5.0) + g)
    val df = rows.toDF("g", "t", "v")
    val res = DomFreq.domfreq(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), Seq("centered"), nDomfreq = 2)
    assert(res.featureNames.size == 4)
    val out = res.df
    assert(out.count() == 120, "one output row per input row (padding dropped)")
    val dom = out.filter($"g" === 1 && $"t" >= 7 && $"t" < 53)
      .select("v_domfreq1_w15c").as[Double].collect()
    assert(dom.forall(f => math.abs(f - 0.2) < 0.07), s"interior windows should peak near 0.2, got ${dom.distinct.mkString(",")}")
  }

  test("trailing domfreq emits one row per input and full windows") {
    val rows = for (t <- 0 until 30) yield (1, t, math.cos(t * 0.7))
    val res = DomFreq.domfreq(rows.toDF("g", "t", "v"), Seq("v"), Seq("g"), Seq("t"), Seq(8), Seq("trailing"), nDomfreq = 2)
    assert(res.df.count() == 30)
    assert(res.df.select("v_domfreq1_w8t").na.drop().count() == 30, "padded trailing windows are always full")
  }
}
