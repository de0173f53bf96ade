package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def decompose(vals: Seq[Double]) = {
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }.toDF("k", "pos", "x")
    TimeOps.seasonalDecompose(df, "x", Seq("k"), Seq("pos"), period = 7,
      phase = pmod(col("pos"), lit(7)).cast("int"))
      .orderBy("pos").collect()
  }

  test("a linear series decomposes into pure trend: seasonal and remainder vanish") {
    // centered 7-MA of a linear ramp IS the center value → detrended = 0
    val out = decompose((0 until 28).map(_ * 2.0 + 5.0))
    val interior = out.drop(3).dropRight(3)
    interior.foreach { r =>
      assert(math.abs(r.getDouble(4) - (r.getLong(1) * 2.0 + 5.0)) < 1e-9, s"trend at ${r.getLong(1)}")
      assert(r.getDouble(5) == 0.0, "seasonal must be exactly 0 (rounded)")
      assert(math.abs(r.getDouble(6)) < 1e-9, "remainder must vanish")
    }
    // truncated edges: trend and remainder are null, the classical convention
    assert(out.take(3).forall(_.isNullAt(4)) && out.takeRight(3).forall(_.isNullAt(4)))
  }

  test("a periodic signal lands in the seasonal component") {
    // period-7 sawtooth around a constant level
    val season = Seq(3.0, 1.0, -2.0, 0.0, 4.0, -1.0, -5.0)
    val out = decompose((0 until 70).map(i => 10.0 + season(i % 7)))
    val interior = out.drop(3).dropRight(3)
    interior.foreach { r =>
      val expected = season((r.getLong(1) % 7).toInt)
      // seasonal means over full cycles recover the sawtooth exactly
      assert(math.abs(r.getDouble(5) - expected) < 0.05,
        s"pos ${r.getLong(1)}: seasonal ${r.getDouble(5)} != $expected")
      assert(math.abs(r.getDouble(6)) < 0.05, s"remainder ${r.getDouble(6)} should be ~0")
    }
  }

  test("even periods are rejected") {
    val df = Seq(("a", 0L, 1.0)).toDF("k", "pos", "x")
    intercept[IllegalArgumentException] {
      TimeOps.seasonalDecompose(df, "x", Seq("k"), Seq("pos"), period = 4, phase = lit(0))
    }
  }
}
