package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TimeOps.asofJoin — two-table backward as-of with tolerance, via the
  * zero-join union+carry.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = Seq(
    ("u1", 100L, 1L), ("u1", 200L, 2L), ("u1", 250L, 3L), ("u1", 900L, 4L),
    ("u2", 100L, 5L), ("u3", 50L, 6L))
    .toDF("user_id", "ts_us", "event_id")

  private lazy val build = Seq(
    ("u1", 100L, 10.0), ("u1", 240L, 24.0), ("u2", 90L, 9.0))
    .toDF("user_id", "ts_us", "price")

  test("backward inclusive pick with tolerance null-out and missing-key null") {
    val out = TimeOps.asofJoin(probe, build, Seq("user_id"), "ts_us", "price", "p",
      toleranceMicros = Some(300L))
      .select("user_id", "ts_us", "event_id", "p")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._3 -> r._4).toMap
    assert(out(1L).contains(10.0), "equal-ts build row is visible (inclusive)")
    assert(out(2L).contains(10.0), "most recent at-or-before 200 is ts=100")
    assert(out(3L).contains(24.0), "ts=250 sees the 240 row")
    assert(out(4L).isEmpty, "900 - 240 = 660 > tolerance 300 → null")
    assert(out(5L).contains(9.0), "u2 picks its own build row")
    assert(out(6L).isEmpty, "u3 has no build rows at all")
  }

  test("no tolerance: arbitrarily old build rows carry") {
    val out = TimeOps.asofJoin(probe, build, Seq("user_id"), "ts_us", "price", "p")
      .where($"event_id" === 4L).select("p").as[Option[Double]].head()
    assert(out.contains(24.0))
  }

  test("probe columns survive untouched; build-only rows never leak") {
    val out = TimeOps.asofJoin(probe, build, Seq("user_id"), "ts_us", "price", "p")
    assert(out.columns.toSeq == Seq("user_id", "ts_us", "event_id", "p"))
    assert(out.count() == probe.count())
  }

  test("plan: ONE exchange and NO join operator — the whole as-of is a union + window") {
    val plan = TimeOps.asofJoin(probe, build, Seq("user_id"), "ts_us", "price", "p",
      toleranceMicros = Some(300L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join operator expected:\n${plan.take(1200)}")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected the single window exchange, got $hashEx:\n${plan.take(1200)}")
  }
}
