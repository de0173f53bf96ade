package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scale-path quantile convention: `approx_percentile` with
  * accuracy >= group size is EXACT and returns the element at rank
  * ceil(p·n) (1-based, ascending) — the convention the
  * q_quantiles_approx DuckDB oracle reproduces as a row_number
  * selection. At 100 TB the same expression runs with bounded memory
  * (~O(accuracy) retained samples) and rank error <= n/accuracy,
  * unlike exact `percentile`, whose agg buffer holds every value.
  */
class QuantileApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile at high accuracy = element at rank ceil(p*n)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(9, 10, 100, 2006)) {
      val xs = Array.fill(n)(rnd.nextDouble() * 100).toSeq
      val df = xs.toDF("v")
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val got = df.agg(expr(s"approx_percentile(v, array(${ps.mkString(",")}), 1000000)"))
        .head().getSeq[Double](0)
      val sorted = xs.sorted
      val exp = ps.map(p => sorted(math.max(math.ceil(p * n).toInt, 1) - 1))
      assert(got == exp, s"n=$n got $got expected $exp")
    }
  }
}
