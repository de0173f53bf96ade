package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TimeOps.arForecast — Yule-Walker AR(2) fit + h-step recursion. */
class ArForecastSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], user: String = "u1") =
    vals.zipWithIndex.map { case (v, i) =>
      (user, (i + 1).toLong * 1000, (i + 1).toLong, java.lang.Double.valueOf(v))
    }.toDF("user_id", "ts_us", "event_id", "value")

  // a strongly autocorrelated AR(1)-ish path (deterministic)
  private val arPath: Seq[Double] = {
    val rnd = new scala.util.Random(5)
    var x = 0.0
    Seq.fill(200) { x = 0.8 * x + rnd.nextGaussian(); x + 10.0 }
  }

  test("coefficients satisfy the Yule-Walker closed forms on the reported ACFs") {
    val out = TimeOps.arForecast(series(arPath), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .select("r_lag1", "r_lag2", "phi1", "phi2", "mu", "last_value", "fc1", "fc2", "fc3")
      .as[(Double, Double, Double, Double, Double, Double, Double, Double, Double)].head()
    val (r1, r2, phi1, phi2, mu, xn, fc1, fc2, fc3) = out
    val den = 1.0 - r1 * r1
    assert(phi1 == (r1 * (1.0 - r2)) / den)
    assert(phi2 == (r2 - r1 * r1) / den)
    // a persistent positive-φ1 process; fc recursion is self-consistent
    assert(r1 > 0.5 && phi1 > 0)
    assert(fc2 == mu + phi1 * (fc1 - mu) + phi2 * (xn - mu))
    assert(fc3 == mu + phi1 * (fc2 - mu) + phi2 * (fc1 - mu))
  }

  test("fc1 is seeded from the last two observations") {
    val out = TimeOps.arForecast(series(arPath), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .select("phi1", "phi2", "mu", "last_value", "fc1")
      .as[(Double, Double, Double, Double, Double)].head()
    val (phi1, phi2, mu, xn, fc1) = out
    val xp = arPath(arPath.length - 2)
    assert(xn == arPath.last)
    assert(fc1 == mu + phi1 * (xn - mu) + phi2 * (xp - mu))
  }

  test("degenerate series gate to null: constant values and single observations") {
    val constant = TimeOps.arForecast(series(Seq.fill(10)(4.0)), "value",
      Seq("user_id"), Seq("ts_us", "event_id"))
      .select("phi1", "fc1").collect().head
    assert(constant.isNullAt(0) && constant.isNullAt(1))
    val single = TimeOps.arForecast(series(Seq(7.0)), "value",
      Seq("user_id"), Seq("ts_us", "event_id"))
      .select("fc1", "last_value").collect().head
    assert(single.isNullAt(0) && single.getDouble(1) == 7.0)
  }

  test("plan: ONE exchange — the fit groupBy reuses the lag window's partitioning") {
    val plan = TimeOps.arForecast(series(arPath), "value", Seq("user_id"), Seq("ts_us", "event_id"))
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 exchange, got $hashEx:\n${plan.take(1500)}")
  }
}
