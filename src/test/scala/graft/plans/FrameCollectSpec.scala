package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity of the r21 primitive window-frame collectors against the
  * collect_list forms they replace: same dropped-null multiset, same
  * frame order, and for the sorted variants the same total order
  * sort_array applies (-0.0 < 0.0, NaN greatest — an r22 ADVICE note
  * claimed sort_array keeps ±0.0 in input order; the explicit
  * [0.0, -0.0] case below pins the running engine refuting that).
  * Pinned on adversarial values (null, NaN, ±0.0, ±1e308) over
  * sliding, centered, and clipped-edge frames.
  */
class FrameCollectSpec extends SparkSpec {
  import spark.implicits._

  private def df = {
    val rng = new scala.util.Random(11)
    val special = Seq(Double.NaN, 0.0, -0.0, 1e308, -1e308, 1.5, -2.5)
    (for (g <- 0 until 4; t <- 0 until 40) yield {
      val pick = rng.nextInt(10)
      val v: java.lang.Double =
        if (pick == 0) null
        else if (pick <= 3) special(rng.nextInt(special.length))
        else rng.nextDouble() * 100 - 50
      (g, t, v)
    }).toDF("g", "t", "v")
  }

  private val win = Window.partitionBy("g").orderBy("t")

  private def bits(row: org.apache.spark.sql.Row, i: Int): Seq[Long] =
    row.getSeq[Double](i).map(java.lang.Double.doubleToRawLongBits)

  test("collectDoubles == collect_list over sliding/centered/clipped frames") {
    for ((lo, hi) <- Seq((-6, 0), (-3, 3), (-50, 0), (0, 5))) {
      val frame = win.rowsBetween(lo, hi)
      val rows = df
        .withColumn("a", FrameAggKernels.collectDoubles($"v", hi - lo + 1).over(frame))
        .withColumn("b", collect_list($"v").over(frame))
        .orderBy("g", "t")
        .select("a", "b").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(bits(r, 0) == bits(r, 1), s"frame ($lo,$hi) row $i")
      }
    }
  }

  test("collectSortedDoubles == sort_array(collect_list) incl. NaN and signed zero") {
    val frame = win.rowsBetween(-7, 0)
    val rows = df
      .withColumn("a", FrameAggKernels.collectSortedDoubles($"v", 8).over(frame))
      .withColumn("b", sort_array(collect_list($"v").over(frame)))
      .orderBy("g", "t")
      .select("a", "b").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(bits(r, 0) == bits(r, 1), s"row $i")
    }
  }

  test("collectSortedDoubles on an explicit [0.0, -0.0] frame: BIT-equal, -0.0 first") {
    // pins the signed-zero order against the RUNNING engine instead of
    // RNG luck (r22 ADVICE asked for this case; it also refutes the
    // ADVICE's claim that sort_array keeps ±0.0 in input order — both
    // engines place -0.0 strictly below +0.0, Double.compare order)
    val zdf = Seq((1, 1, 0.0), (1, 2, -0.0), (1, 3, 1.0))
      .toDF("g", "t", "v")
    val frame = win.rowsBetween(-2, 0)
    val r = zdf
      .withColumn("a", FrameAggKernels.collectSortedDoubles($"v", 3).over(frame))
      .withColumn("b", sort_array(collect_list($"v").over(frame)))
      .orderBy("t").select("a", "b").collect().last
    assert(bits(r, 0) == bits(r, 1))
    // both outputs are IEEE total order: -0.0 strictly before +0.0
    assert(java.lang.Double.doubleToRawLongBits(r.getSeq[Double](0).head) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(java.lang.Double.doubleToRawLongBits(r.getSeq[Double](1).head) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("collectSortedLongs == sort_array(collect_list) on nullable longs") {
    val rng = new scala.util.Random(13)
    val ldf = (for (g <- 0 until 3; t <- 0 until 30) yield {
      val v: java.lang.Long =
        if (rng.nextInt(8) == 0) null else (rng.nextLong() % 1000L): java.lang.Long
      (g, t, v)
    }).toDF("g", "t", "v")
    val frame = win.rowsBetween(-3, 3)
    val rows = ldf
      .withColumn("a", FrameAggKernels.collectSortedLongs($"v", 7).over(frame))
      .withColumn("b", sort_array(collect_list($"v").over(frame)))
      .orderBy("g", "t")
      .select("a", "b").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"row $i")
    }
  }

  test("empty frames give empty arrays, never null") {
    val one = Seq((1, 1, null: java.lang.Double)).toDF("g", "t", "v")
    val frame = win.rowsBetween(-3, 0)
    val r = one
      .withColumn("a", FrameAggKernels.collectDoubles($"v", 4).over(frame))
      .select("a").head()
    assert(!r.isNullAt(0) && r.getSeq[Double](0).isEmpty)
  }
}
