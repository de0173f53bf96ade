package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the upsampler's per-copy Rademacher sign quality (advisor
  * r16): cross-copy replicas of the SAME vector must have cosine near
  * 0, which holds iff every pair of copies agrees on ~half the 64
  * dims. The previous single-linear-form parity failed exactly this —
  * copies (8,9) agreed on 3/64 dims (cosine ≈ −0.9) — so the band
  * below is the regression test for that structure, not a statistical
  * hope: the xxhash64 signs are deterministic and the measured worst
  * pair is fixed for all time.
  */
class UpsampleSignSpec extends SparkSpec {
  import spark.implicits._

  test("cross-copy sign agreement concentrates near d/2 for every copy pair") {
    val d = 64
    val copies = 0 to 10 // copy 0 is identity (+1 on every dim)
    // FLOAT signs (r18): copySign emits ±1.0f so the embedding multiply
    // preserves array<float> — the spec reads the same type
    val signs: Map[Int, Array[Float]] = copies.map { i =>
      val row = spark.range(d.toLong).toDF("j")
        .select(collect_list(
          if (i == 0) lit(1.0f)
          else UpsampleTestdata.copySign(i, col("j").cast("int"))).as("s"))
        .head().getSeq[Float](0).toArray
      i -> row
    }.toMap
    val pairs = for {
      a <- copies; b <- copies if a < b
    } yield {
      val agree = (0 until d).count(j => signs(a)(j) == signs(b)(j))
      val cos = (2.0 * agree - d) / d // equal-magnitude-dims cosine
      (a, b, agree, cos)
    }
    val worst = pairs.maxBy { case (_, _, _, c) => math.abs(c) }
    // true-random signs: agreement ~ Binomial(64, 1/2), sd 4; the old
    // scheme sat 29 sd out. Deterministic outcome, so the band is a
    // pin, not a flake: every pair within ±14 of 32 (|cos| <= 0.4375)
    assert(pairs.forall { case (_, _, ag, _) => ag >= 18 && ag <= 46 },
      s"structured copy-pair signs: worst $worst; all=${pairs.filter(p => math.abs(p._4) > 0.4)}")
    val meanAbs = pairs.map { case (_, _, _, c) => math.abs(c) }.sum / pairs.size
    assert(meanAbs <= 0.15, s"mean |cross-copy cosine| too high: $meanAbs (worst $worst)")
  }

  test("within-copy geometry is exactly preserved: s_j^2 = 1 on every dim") {
    val d = 64
    (1 to 4).foreach { i =>
      val s = spark.range(d.toLong).toDF("j")
        .select(collect_list(UpsampleTestdata.copySign(i, col("j").cast("int"))).as("s"))
        .head().getSeq[Float](0)
      assert(s.forall(v => v == 1.0f || v == -1.0f), s"copy $i signs not ±1: $s")
    }
  }

  test("sign multiply preserves array<float> (sf1 schema parity)") {
    // the r18 sf1 sweep failed every ANN query because a double ±1.0
    // literal promoted the embedding elements to array<double>; this
    // pins the upsampled element type to the source's FloatType
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = Seq((1L, Array(1.0f, -2.0f))).toDF("vec_id", "embedding")
    val out = df.withColumn("embedding",
      transform(col("embedding"), (x, j) => x * UpsampleTestdata.copySign(3, j)))
    val et = out.schema("embedding").dataType.asInstanceOf[ArrayType].elementType
    assert(et == FloatType, s"element type promoted to $et")
  }
}
