package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ewma matches pandas ewm(alpha).mean() adjust=true, resets per group") {
    val vals = Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3)
    val df = (for (g <- Seq(1, 2); (v, i) <- vals.zipWithIndex) yield (g, i, v)).toDF("g", "t", "v")
    val out = TimeOps.ewma(df, "v", Seq("g"), Seq("t"), alpha = 0.2)
    val expected = Seq(3.0, 1.888888888889, 2.754098360656, 2.329268292683,
      4.313660161828, 3.849162980311, 4.216331125184)
    for (g <- Seq(1, 2)) {
      val got = out.filter($"g" === g).orderBy("t").select("ewma").as[Double].collect()
      assertApprox(got.map(Some(_)).toSeq, expected.map(Some(_)), 1e-9, s"g=$g")
    }
  }

  test("ewma ungrouped (groupCols empty) is exact on a multi-partition single series") {
    val vals = Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3)
    // scatter the series across many partitions up front: the op must
    // still treat it as ONE sequential series, not 8 independent ones
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v").repartition(8)
    val out = TimeOps.ewma(df, "v", Seq.empty, Seq("t"), alpha = 0.2)
    val expected = Seq(3.0, 1.888888888889, 2.754098360656, 2.329268292683,
      4.313660161828, 3.849162980311, 4.216331125184)
    val got = out.orderBy("t").select("ewma").as[Double].collect()
    assertApprox(got.map(Some(_)).toSeq, expected.map(Some(_)), 1e-9, "ungrouped")
  }

  test("ewmaTruncated converges to exact ewma deep into the series") {
    val vals = (0 until 100).map(i => math.sin(i * 0.3) * 10 + i * 0.1)
    val df = vals.zipWithIndex.map { case (v, i) => (1, i, v) }.toDF("g", "t", "v")
    val exact = TimeOps.ewma(df, "v", Seq("g"), Seq("t"), alpha = 0.2)
      .orderBy("t").select("ewma").as[Double].collect()
    val trunc = TimeOps.ewmaTruncated(df, "v", Seq("g"), Seq("t"), alpha = 0.2, k = 64, out = "e")
      .orderBy("t").select("e").as[Double].collect()
    // (1-0.2)^64 ~ 6e-7: tail truncation error is bounded by that scale
    exact.drop(64).zip(trunc.drop(64)).foreach { case (e, t) =>
      assert(math.abs(e - t) < 1e-4, s"exact=$e trunc=$t")
    }
  }

  test("sessionize splits on gaps greater than threshold") {
    val df = Seq((1, 0L), (1, 10L), (1, 100L), (1, 105L), (2, 0L))
      .toDF("g", "ts")
    val out = TimeOps.sessionize(df, Seq("g"), Seq("ts"), "ts", gapMicros = 50L)
      .orderBy("g", "ts").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L, 2L, 1L))
  }

  test("asofCarry carries last matching value forward inclusively") {
    val df = Seq((1, 0L, "a", 1.0), (1, 1L, "p", 2.0), (1, 2L, "a", 3.0), (1, 3L, "p", 4.0), (1, 4L, "a", 5.0))
      .toDF("g", "ts", "k", "v")
    val out = TimeOps.asofCarry(df, Seq("g"), Seq("ts"), col("k") === "p", "v", "carry")
      .orderBy("ts").select("carry").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(2.0), Some(2.0), Some(4.0), Some(4.0)))
  }
}
