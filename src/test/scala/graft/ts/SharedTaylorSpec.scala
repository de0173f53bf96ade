package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity pins for the shared-frame taylor path
  * (Taylor.sharedKernelBlock / Featurize.fusedWindowBlock): a
  * multi-spec family evaluated against ONE wrapped collect_list frame
  * (TaylorKernel frameLo/colIdx >= 0) must be bit-identical to the
  * per-spec dedicated-frame kernels, and a mixed lag+roll+taylor fused
  * block must equal the same features computed step by step.
  */
class SharedTaylorSpec extends SparkSpec {
  import spark.implicits._

  // varied group sizes: g0 long, g1 shorter than the widest window,
  // g2 a single row — exercises every clipped-edge branch
  private def df: DataFrame =
    ((for (t <- 0 until 40) yield (0, t, math.sin(t * 0.3), math.cos(t * 0.17) * 2.0)) ++
      (for (t <- 0 until 5) yield (1, t, t * 1.5 - 2.0, math.sin(t * 1.1))) ++
      Seq((2, 0, 4.2, -1.3)))
      .toDF("g", "t", "v", "u").repartition(3)

  private val aligns = Seq("trailing", "centered")
  private val spans = Seq(None, Some(5))

  test("multi-spec shared frame == per-spec dedicated kernels (bit-exact)") {
    for (fill <- Seq(true, false)) {
      val shared = Taylor.windowedTaylorCoefs(df, Seq("v", "u"), Seq("g"), Seq("t"),
        taylorDegree = 2, Seq(7, 9), aligns, spans, fillEdges = fill)
      assert(shared.featureNames.size == 2 * 2 * 2 * 2 * 3)
      // one spec at a time → kernelPath's dedicated bare frame
      val dedicated = (for {
        c <- Seq("v", "u"); w <- Seq(7, 9); a <- aligns; s <- spans
      } yield (c, w, a, s)).foldLeft(df) { case (d, (c, w, a, s)) =>
        Taylor.windowedTaylorCoefs(d, Seq(c), Seq("g"), Seq("t"),
          taylorDegree = 2, Seq(w), Seq(a), Seq(s), fillEdges = fill).df
      }
      val cols = shared.featureNames.map(col)
      val aRows = shared.df.orderBy("g", "t").select(cols: _*).collect().toSeq
      val bRows = dedicated.orderBy("g", "t").select(cols: _*).collect().toSeq
      assert(aRows == bRows, s"shared-frame taylor diverged from dedicated kernels (fill=$fill)")
    }
  }

  test("shared frame with NULL values matches the declarative CASE form") {
    val holed = df.withColumn("v", when($"t" % 11 === 3, lit(null)).otherwise($"v"))
    val shared = Taylor.windowedTaylorCoefs(holed, Seq("v", "u"), Seq("g"), Seq("t"),
      taylorDegree = 1, Seq(7, 9), Seq("centered"), Seq(None), fillEdges = true)
    val decl = Taylor.windowedTaylorCoefs(holed, Seq("v", "u"), Seq("g"), Seq("t"),
      taylorDegree = 1, Seq(7, 9), Seq("centered"), Seq(None), fillEdges = true,
      useKernel = false)
    val cols = shared.featureNames.map(col)
    val aRows = shared.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    val bRows = decl.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    assert(aRows == bRows, "wrapped shared frame must null-poison like the lag/lead CASE form")
  }

  test("SINGLE-column shared frame (bare NaN-encoded) with NULLs matches the declarative form") {
    // one source column + several specs → fusedWindowBlock's bareNaN
    // fast path (collect_list(coalesce(v, NaN))); nulls must keep
    // their frame position exactly like the wrapped multi-column frame
    val holed = df.withColumn("v", when($"t" % 7 === 2, lit(null)).otherwise($"v"))
    for (fill <- Seq(true, false)) {
      val shared = Taylor.windowedTaylorCoefs(holed, Seq("v"), Seq("g"), Seq("t"),
        taylorDegree = 2, Seq(7, 9), aligns, spans, fillEdges = fill)
      val decl = Taylor.windowedTaylorCoefs(holed, Seq("v"), Seq("g"), Seq("t"),
        taylorDegree = 2, Seq(7, 9), aligns, spans, fillEdges = fill, useKernel = false)
      val cols = shared.featureNames.map(col)
      val aRows = shared.df.orderBy("g", "t").select(cols: _*).collect().toSeq
      val bRows = decl.df.orderBy("g", "t").select(cols: _*).collect().toSeq
      assert(aRows == bRows, s"bare NaN-encoded shared frame diverged on null data (fill=$fill)")
    }
  }

  test("SINGLE-column fused lag+roll+taylor with NULLs == step by step") {
    val holed = df.withColumn("v", when($"t" % 11 === 3, lit(null)).otherwise($"v"))
    val fused = Featurize.featurizeData(holed, Seq("g"), Seq("t"), Seq(
      Featurize.Lag(Seq("v"), Seq(1, 3)),
      Featurize.Rollmean(Seq("v"), Seq(5)),
      Featurize.WindowedTaylorCoefs(Seq("v"), taylorDegree = 1, Seq(9), Seq("centered"), Seq(None), fillEdges = true)))
    val stepped = {
      val a = Featurize.lagFeatures(holed, Seq("v"), Seq("g"), Seq("t"), Seq(1, 3))
      val b = a.andThen(d => Featurize.rollmean(d, Seq("v"), Seq("g"), Seq("t"), Seq(5), useKernel = false))
      b.andThen(d => Taylor.windowedTaylorCoefs(d, Seq("v"), Seq("g"), Seq("t"),
        taylorDegree = 1, Seq(9), Seq("centered"), Seq(None), fillEdges = true, useKernel = false))
    }
    assert(fused.featureNames.sorted == stepped.featureNames.sorted)
    val cols = fused.featureNames.map(col)
    val aRows = fused.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    val bRows = stepped.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    assert(aRows == bRows, "single-column fused block diverged from declarative step-by-step")
  }

  test("fused lag+roll+taylor block == the same features step by step") {
    val fused = Featurize.featurizeData(df, Seq("g"), Seq("t"), Seq(
      Featurize.Lag(Seq("v", "u"), Seq(1, 3)),
      Featurize.Rollmean(Seq("v", "u"), Seq(5)),
      Featurize.WindowedTaylorCoefs(Seq("v", "u"), taylorDegree = 1, Seq(9), Seq("centered"), Seq(None), fillEdges = true),
      Featurize.HorizonTargets(Seq("v"), Seq(2), "wide")))
    val stepped = {
      val a = Featurize.lagFeatures(df, Seq("v", "u"), Seq("g"), Seq("t"), Seq(1, 3))
      val b = a.andThen(d => Featurize.rollmean(d, Seq("v", "u"), Seq("g"), Seq("t"), Seq(5)))
      val c = b.andThen(d => Taylor.windowedTaylorCoefs(d, Seq("v", "u"), Seq("g"), Seq("t"),
        taylorDegree = 1, Seq(9), Seq("centered"), Seq(None), fillEdges = true))
      c.andThen(d => Featurize.horizonTargets(d, Seq("v"), Seq("g"), Seq("t"), Seq(2), "wide"))
    }
    assert(fused.featureNames.sorted == stepped.featureNames.sorted)
    val cols = (fused.featureNames :+ "v_target2").map(col)
    val aRows = fused.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    val bRows = stepped.df.orderBy("g", "t").select(cols: _*).collect().toSeq
    assert(aRows == bRows, "fused block diverged from step-by-step features")
  }
}
