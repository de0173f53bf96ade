package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TimeOps.changepoint — max-|CUSUM| mean-shift detection. */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: Seq[(String, Long, Long, java.lang.Double)]) =
    rows.toDF("user_id", "ts_us", "event_id", "value")

  test("an obvious mean shift is located exactly, with exact segment means") {
    // 10 points at 0.0 then 10 at 10.0 → split after k=10
    val rows = (1 to 20).map(i =>
      ("u1", i.toLong * 1000, i.toLong, java.lang.Double.valueOf(if (i <= 10) 0.0 else 10.0)))
    val out = TimeOps.changepoint(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .select("user_id", "n", "cp_k", "cp_ord", "stat", "mean_left", "mean_right")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n, k, ord, stat, ml, mr) = out.head
    assert(n == 20 && k == 10 && ord == 10000)
    // S_10 = 0, S_20 = 100 → D_10 = |0 - 10*100/20| = 50
    assert(stat == 50.0 && ml == 0.0 && mr == 10.0)
  }

  test("binseg2: two injected mean shifts are both located (one per round)") {
    // 10 @ 0.0 | 10 @ 10.0 | 10 @ 20.0: level 1 splits at the DOMINANT
    // boundary, level 2 finds the other inside its segment
    val rows = (1 to 30).map { i =>
      val v = if (i <= 10) 0.0 else if (i <= 20) 10.0 else 20.0
      ("u1", i.toLong * 1000, i.toLong, java.lang.Double.valueOf(v))
    }
    val out = TimeOps.binseg2(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .collect().head
    val cp1 = out.getAs[Long]("cp_ord")
    val cpL = out.getAs[Long]("cp_left_ord")
    val cpR = out.getAs[Long]("cp_right_ord")
    // by symmetry the max-|CUSUM| split lands mid-series (k=15 is the
    // peak of the tent for this ramp? verify: both true boundaries
    // must be recovered across the two rounds)
    val found = Set(cp1, cpL, cpR).filter(_ != 0)
    assert(found.contains(10000L) && found.contains(20000L),
      s"both shifts must surface: cp1=$cp1 left=$cpL right=$cpR")
    // a segment too short to split yields null level-2 columns
    val tiny = (1 to 3).map(i => ("u2", i.toLong, i.toLong,
      java.lang.Double.valueOf(if (i <= 2) 0.0 else 9.0)))
    val t = TimeOps.binseg2(series(tiny), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .collect().head
    // level 1 splits somewhere in 3 points; at least one side has < 2
    // points → its level-2 columns are null
    assert(t.isNullAt(t.fieldIndex("cp_left_ord")) || t.isNullAt(t.fieldIndex("cp_right_ord")),
      s"a 1-point segment cannot split: $t")
  }

  test("constant series: all D_k = 0, tie breaks to the smallest split index") {
    val rows = (1 to 8).map(i => ("u1", i.toLong, i.toLong, java.lang.Double.valueOf(3.0)))
    val out = TimeOps.changepoint(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .select("cp_k", "stat").as[(Long, Double)].collect()
    assert(out.head == ((1L, 0.0)))
  }

  test("nulls are excluded: k indexes non-null points only, means ignore nulls") {
    val rows = Seq[(String, Long, Long, java.lang.Double)](
      ("u1", 1, 1, 1.0), ("u1", 2, 2, null), ("u1", 3, 3, 1.0),
      ("u1", 4, 4, 9.0), ("u1", 5, 5, 9.0))
    val out = TimeOps.changepoint(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .select("n", "cp_k", "cp_ord", "mean_left", "mean_right")
      .as[(Long, Long, Long, Double, Double)].collect()
    val (n, k, ord, ml, mr) = out.head
    assert(n == 4 && k == 2 && ord == 3 && ml == 1.0 && mr == 9.0)
  }

  test("single-point series yields no row (no admissible split)") {
    val rows = Seq(("u1", 1L, 1L, java.lang.Double.valueOf(5.0)))
    assert(TimeOps.changepoint(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id")).count() == 0)
  }

  test("rollQuantiles: sorted-pick ranks, min_periods gate, null handling") {
    // w=3: ranks ceil(.25*3)=1, ceil(.5*3)=2, ceil(.75*3)=3
    val rows = Seq[(String, Long, Long, java.lang.Double)](
      ("u1", 1, 1, 5.0), ("u1", 2, 2, 1.0), ("u1", 3, 3, 9.0),
      ("u1", 4, 4, null), ("u1", 5, 5, 2.0), ("u1", 6, 6, 7.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = TimeOps.rollQuantiles(rows, "value", Seq("user_id"), Seq("ts_us", "event_id"), w = 3)
      .select("ts_us", "value_q1_w3", "value_med_w3", "value_q3_w3")
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))).toMap
    assert(out(1L).forall(_.isEmpty) && out(2L).forall(_.isEmpty), "min_periods=w")
    assert(out(3L) == Seq(Some(1.0), Some(5.0), Some(9.0)), s"sorted picks of (5,1,9): ${out(3L)}")
    assert(out(4L).forall(_.isEmpty) && out(5L).forall(_.isEmpty),
      "a null inside the window suppresses the emit")
    assert(out(6L).forall(_.isEmpty), "window (null,2,7) has only 2 non-null values")
  }

  test("plan: ONE exchange — the argmax groupBy reuses the window's series partitioning") {
    val rows = (1 to 6).map(i => ("u1", i.toLong, i.toLong, java.lang.Double.valueOf(i.toDouble)))
    val plan = TimeOps.changepoint(series(rows), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 exchange, got $hashEx:\n${plan.take(1500)}")
  }
}
