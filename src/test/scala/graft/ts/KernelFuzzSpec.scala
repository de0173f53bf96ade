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

  test("shared-frame fuzz: random multi-spec taylor families match per-spec dedicated kernels") {
    // exercises the frameLo/colIdx indexing: mixed aligns/windows/spans
    // over 1-2 columns share ONE wrapped frame; any index-arithmetic
    // slip diverges from the dedicated-frame kernels
    val rnd = new Random(404)
    for (trial <- 0 until 4) {
      val df = randomDf(3000 + trial).withColumn("u", col("v") * 1.3 - 2.0)
      val cols = if (rnd.nextBoolean()) Seq("v") else Seq("v", "u")
      val degree = 1 + rnd.nextInt(2)
      val ws = Seq(Seq(5, 9), Seq(7, 11), Seq(5, 7, 9))(rnd.nextInt(3))
      val aligns = if (rnd.nextBoolean()) Seq("trailing", "centered") else Seq("centered")
      val ew = if (rnd.nextBoolean()) Seq(None) else Seq(None, Some(4 + rnd.nextInt(5)))
      val fill = rnd.nextBoolean()
      val clue = s"shared trial=$trial cols=$cols d=$degree ws=$ws aligns=$aligns ew=$ew fill=$fill"
      val shared = Taylor.windowedTaylorCoefs(df, cols, Seq("g"), Seq("t"),
        degree, ws, aligns, ew, fill, useKernel = true)
      val dedicated = {
        val specs = for (c <- cols; w <- ws; a <- aligns; s <- ew) yield (c, w, a, s)
        val out = specs.foldLeft(df) { case (d, (c, w, a, s)) =>
          Taylor.windowedTaylorCoefs(d, Seq(c), Seq("g"), Seq("t"),
            degree, Seq(w), Seq(a), Seq(s), fill, useKernel = true).df
        }
        FeatureResult(out, shared.featureNames)
      }
      check(dedicated, shared, clue)
    }
  }

  test("fused roll+taylor fuzz: random blocks match step-by-step evaluation") {
    // exercises multiRoll's futureLen path: rolls fused into a frame
    // that reaches ahead for a random centered taylor spec
    val rnd = new Random(808)
    for (trial <- 0 until 4) {
      val df = randomDf(4000 + trial).withColumn("u", col("v") * 0.7 + 1.0)
      val rollW = 2 + rnd.nextInt(9)
      val tayW = Seq(5, 7, 9, 11)(rnd.nextInt(4))
      val lagK = 1 + rnd.nextInt(5)
      val clue = s"fused trial=$trial rollW=$rollW tayW=$tayW lag=$lagK"
      val fused = Featurize.featurizeData(df, Seq("g"), Seq("t"), Seq(
        Featurize.Lag(Seq("v", "u"), Seq(lagK)),
        Featurize.Rollmean(Seq("v", "u"), Seq(rollW)),
        Featurize.WindowedTaylorCoefs(Seq("v", "u"), 1, Seq(tayW), Seq("centered"), Seq(None), fillEdges = true)))
      val stepped = Featurize.lagFeatures(df, Seq("v", "u"), Seq("g"), Seq("t"), Seq(lagK))
        .andThen(d => Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(rollW)))
        .andThen(d => Taylor.windowedTaylorCoefs(d, Seq("v", "u"), Seq("g"), Seq("t"),
          1, Seq(tayW), Seq("centered"), Seq(None), fillEdges = true))
      check(stepped, fused, clue)
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
