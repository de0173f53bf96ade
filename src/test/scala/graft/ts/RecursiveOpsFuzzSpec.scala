package graft.ts

import graft.SparkSpec
import scala.util.Random

/** Randomized cross-check of the imperative recursive scans (cusum,
  * brownSmoothing) against independent straight-line Scala references:
  * random group sizes (including singletons), random values, random
  * null patterns, shuffled input order. Any divergence is a bug in the
  * repartition/sort/key-reset plumbing or the state recurrences.
  */
class RecursiveOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def randomSeries(seed: Int): Seq[(Int, Int, Option[Double])] = {
    val rnd = new Random(seed)
    val sizes = Seq.fill(5)(1 + rnd.nextInt(30))
    val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map { i =>
        val v = if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 100 - 20)
        (g, i, v)
      }
    }
    rnd.shuffle(rows) // input arrives unordered; the ops must sort
  }

  private def refCusum(xs: Seq[Option[Double]], t: Double, k: Double): Seq[Option[(Double, Double)]] = {
    var sPos = 0.0; var sNeg = 0.0
    xs.map {
      case None => None
      case Some(x) =>
        sPos = math.max(0.0, sPos + (x - t - k))
        sNeg = math.max(0.0, sNeg + (t - k - x))
        Some((sPos, sNeg))
    }
  }

  private def refBrown(xs: Seq[Option[Double]], alpha: Double): Seq[Option[(Double, Double)]] = {
    val beta = 1.0 - alpha
    var n1, d1, n2, d2 = 0.0
    xs.map { v =>
      v match {
        case None => n1 *= beta; d1 *= beta; n2 *= beta; d2 *= beta
        case Some(x) =>
          n1 = beta * n1 + x; d1 = beta * d1 + 1.0
          n2 = beta * n2 + n1 / d1; d2 = beta * d2 + 1.0
      }
      if (d1 > 0.0 && d2 > 0.0) Some((n1 / d1, n2 / d2)) else None
    }
  }

  test("cusum fuzz: matches a straight-line reference on random null-y shuffled series") {
    for (trial <- 0 until 5) {
      val rows = randomSeries(500 + trial)
      val df = rows.toDF("g", "t", "v").repartition(7)
      val out = TimeOps.cusum(df, "v", Seq("g"), Seq("t"), target = 10.0, slack = 2.0, threshold = 50.0)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (if (r.isNullAt(3)) None else Some((r.getDouble(3), r.getDouble(4)))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val ordered = grp.sortBy(_._2)
        val exp = refCusum(ordered.map(_._3), 10.0, 2.0)
        ordered.zip(exp).foreach { case ((_, t, _), e) =>
          assert(out((g, t)) == e, s"trial $trial g=$g t=$t: ${out((g, t))} vs $e")
        }
      }
    }
  }

  test("brown fuzz: matches a straight-line reference on random null-y shuffled series") {
    for (trial <- 0 until 5) {
      val rows = randomSeries(900 + trial)
      val df = rows.toDF("g", "t", "v").repartition(5)
      val out = TimeOps.brownSmoothing(df, "v", Seq("g"), Seq("t"), alpha = 0.25)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (if (r.isNullAt(3)) None else Some((r.getDouble(3), r.getDouble(4)))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val ordered = grp.sortBy(_._2)
        val exp = refBrown(ordered.map(_._3), 0.25)
        ordered.zip(exp).foreach { case ((_, t, _), e) =>
          assert(out((g, t)) == e, s"trial $trial g=$g t=$t: ${out((g, t))} vs $e")
        }
      }
    }
  }
}
