package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized cross-check of every kernel against its Column-expression
  * twin: random group sizes (degenerate through long), random values,
  * random window specs — any divergence is a correctness bug in the
  * fast path. Deterministic seeds keep failures reproducible.
  */
class KernelFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Int) = {
    val rnd = new Random(seed)
    val sizes = Seq.fill(6)(1 + rnd.nextInt(40))
    sizes.zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map(i => (g, i, rnd.nextDouble() * 20 - 10))
    }.toDF("g", "t", "v")
  }

  private def collectMap(r: FeatureResult) = {
    val cols = Seq("g", "t") ++ r.featureNames
    r.df.select(cols.map(col): _*).collect()
      .map(row => (row.getInt(0), row.getInt(1)) ->
        (2 until row.length).map(i => if (row.isNullAt(i)) None else Some(row.getDouble(i))))
      .toMap
  }

  private def check(e: FeatureResult, k: FeatureResult, clue: String): Unit = {
    val em = collectMap(e); val km = collectMap(k)
    assert(em.keySet == km.keySet, clue)
    for (key <- em.keySet) assert(em(key) == km(key), s"$clue $key: ${em(key)} vs ${km(key)}")
  }

  test("taylor kernel fuzz: random specs and group sizes match the expression form bit-exactly") {
    val rnd = new Random(99)
    for (trial <- 0 until 6) {
      val df = randomDf(1000 + trial)
      val degree = 1 + rnd.nextInt(2)
      val w = Seq(5, 7, 9, 11)(rnd.nextInt(4))
      val align = if (rnd.nextBoolean()) "trailing" else "centered"
      val ew = if (rnd.nextBoolean()) None else Some(3 + rnd.nextInt(8))
      val fill = rnd.nextBoolean()
      val clue = s"trial=$trial d=$degree w=$w $align ew=$ew fill=$fill"
      check(
        Taylor.windowedTaylorCoefs(df, Seq("v"), Seq("g"), Seq("t"), degree, Seq(w), Seq(align), Seq(ew), fill, useKernel = false),
        Taylor.windowedTaylorCoefs(df, Seq("v"), Seq("g"), Seq("t"), degree, Seq(w), Seq(align), Seq(ew), fill, useKernel = true),
        clue)
    }
  }

  test("roll-fold kernel fuzz: random windows match the expression forms bit-exactly") {
    val rnd = new Random(7)
    for (trial <- 0 until 4) {
      val df = randomDf(2000 + trial)
      val w = 2 + rnd.nextInt(12)
      check(
        Featurize.rollmean(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), None, useKernel = false),
        Featurize.rollmean(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), None, useKernel = true),
        s"rollmean w=$w")
      check(
        Featurize.rollStats(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), None, useKernel = false),
        Featurize.rollStats(df, Seq("v"), Seq("g"), Seq("t"), Seq(w), None, useKernel = true),
        s"rollstats w=$w")
      val lagK = 1 + rnd.nextInt(3)
      check(
        Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK, w + 1, useKernel = false),
        Featurize.autocorr(df, "v", Seq("g"), Seq("t"), lagK, w + 1, useKernel = true),
        s"autocorr w=${w + 1} k=$lagK")
    }
  }
}
