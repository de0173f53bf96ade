package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The kernel path must be BIT-identical to the Column-expression path
  * (same TaylorBasis tables, same fold order) on every alignment /
  * ew_span / fill combination, including groups shorter than the
  * window — that is what lets queries switch to the fast path with the
  * oracle unchanged.
  */
class TaylorKernelSpec extends SparkSpec {
  import spark.implicits._

  // group sizes straddling every edge case: n < hw, hw <= n < w, n = w, n > w
  private lazy val df = (for {
    (g, n) <- Seq((0, 1), (1, 2), (2, 3), (3, 5), (4, 7), (5, 40))
    i <- 0 until n
  } yield (g, i, math.sin(i * 0.7) * 5 + 0.3 * i + g)).toDF("g", "t", "v")

  private def both(degree: Int, w: Int, align: String, ew: Option[Int], fill: Boolean) = {
    def run(useKernel: Boolean) =
      Taylor.windowedTaylorCoefs(df, Seq("v"), Seq("g"), Seq("t"),
          degree, Seq(w), Seq(align), Seq(ew), fill, useKernel = useKernel)
    (run(false), run(true))
  }

  for {
    (degree, w) <- Seq((1, 5), (2, 7))
    align <- Seq("trailing", "centered")
    ew <- Seq(None, Some(4))
    fill <- Seq(true, false)
  } test(s"kernel == expressions: d=$degree w=$w $align ew=$ew fill=$fill") {
    val (e, k) = both(degree, w, align, ew, fill)
    assert(e.featureNames == k.featureNames)
    val cols = Seq("g", "t") ++ e.featureNames
    def collectMap(r: FeatureResult) =
      r.df.select(cols.map(col): _*).collect()
        .map(row => (row.getInt(0), row.getInt(1)) ->
          (2 until row.length).map(i => if (row.isNullAt(i)) None else Some(row.getDouble(i))))
        .toMap
    val em = collectMap(e)
    val km = collectMap(k)
    assert(em.keySet == km.keySet)
    for (key <- em.keySet)
      assert(em(key) == km(key), s"row $key: expr ${em(key)} vs kernel ${km(key)}")
  }
}
