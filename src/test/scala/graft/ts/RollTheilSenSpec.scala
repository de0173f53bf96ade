package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TimeOps.rollTheilSen — the rolling (windowed) robust slope —
  * against a brute-force loop median, its robustness contrast with a
  * rolling OLS, and the bounded-frame plan shape.
  */
class RollTheilSenSpec extends SparkSpec {
  import spark.implicits._

  private val w = 14

  private def run(rows: Seq[(Long, Long, Double)]) =
    TimeOps.rollTheilSen(rows.toDF("user_id", "ts_us", "value"),
      "value", "ts_us", Seq("user_id"), Seq("ts_us"), w)
      .orderBy("ts_us").collect()

  test("matches the brute-force windowed lower-median slope (noisy series)") {
    val rows = (0 until 60).map { t =>
      (1L, t.toLong * 1000L, 2.0 * t + ((t * 2654435761L) % 97L).toDouble / 9.7)
    }
    val got = run(rows)
    rows.indices.foreach { t =>
      if (t < w - 1) assert(got(t).isNullAt(3), s"t=$t: window not full yet")
      else {
        val win = rows.slice(t - w + 1, t + 1)
        val slopes = (for {
          a <- 0 until w; b <- (a + 1) until w
        } yield (win(b)._3 - win(a)._3) / (win(b)._2 - win(a)._2).toDouble).sorted
        assert(got(t).getDouble(3) == slopes((slopes.size + 1) / 2 - 1),
          s"t=$t: ${got(t).getDouble(3)} vs brute force")
      }
    }
  }

  test("robustness: a spike passing through the window leaves the rolling slope near truth") {
    // clean slope 3 per ts-unit, one wild spike mid-series
    val rows = (0 until 40).map { t =>
      (1L, t.toLong, if (t == 25) 1.0e6 else 3.0 * t)
    }
    val got = run(rows)
    // every full window (even the 13 containing the spike) keeps the
    // median slope exactly 3: ≤13 of 91 pair slopes touch the spike
    (w - 1 until 40).foreach { t =>
      assert(got(t).getDouble(3) == 3.0,
        s"t=$t: rolling Sen slope must shrug off the spike: ${got(t)}")
    }
  }

  test("scale shape: one bounded sliding frame, kernel in the executed plan") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts_us", "event_id", "value")
    val plan = TimeOps.rollTheilSen(ev, "value", "ts_us", Seq("user_id"),
      Seq("ts_us", "event_id"), w).queryExecution.executedPlan.toString
    val lower = plan.toLowerCase
    assert(lower.contains("rolltheilsenagg"), s"aggregate must plan:\n${plan.take(1500)}")
    assert("specifiedwindowframe\\(rowframe, -13, currentrow".r.findAllIn(lower).nonEmpty,
      s"frame must be the bounded trailing 14 rows:\n${plan.take(1500)}")
    // the fold runs INSIDE the window aggregate (r21): no collect_list
    // materialization anywhere, one Window node
    assert(plan.linesIterator.count(_.contains("Window [")) == 1 &&
      !lower.contains("collect_list"),
      s"one WindowExec, no collect_list:\n${plan.take(2000)}")
  }

  test("frame-fold aggregate ≡ pair kernel: verdicts align on nulls and clipped frames") {
    import graft.plans.{FrameAggKernels, StlKernels}
    // null value at t = 20: every window containing it must be null on
    // BOTH forms (pair kernel: null element; aggregate: nullSeen latch)
    val df = (0 until 45).map { t =>
      (1L, t.toLong * 1000L, if (t == 20) None else Some(2.0 * t + (t % 5)))
    }.toDF("user_id", "ts_us", "value")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us").rowsBetween(-(w - 1), 0)
    val got = df.select(col("ts_us"),
        StlKernels.rollTheilSen(collect_list(
          array(col("ts_us").cast("double"), col("value").cast("double"))).over(win), w).as("p"),
        FrameAggKernels.rollTheilSen(
          col("ts_us").cast("double"), col("value").cast("double"), w).over(win).as("q"))
      .orderBy("ts_us").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"verdict mismatch: $r")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"value mismatch: $r")
    }
    val nullAt = got.map(r => (r.getLong(0) / 1000L).toInt -> r.isNullAt(2)).toMap
    (20 until 20 + w).foreach(t => assert(nullAt(t), s"t=$t window holds the null"))
    assert(!nullAt(19) && !nullAt(20 + w), "clean full windows stay non-null")
  }
}
