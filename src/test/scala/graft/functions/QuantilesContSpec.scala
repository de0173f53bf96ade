package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Profile.quantilesContBy — the r14 bounded-state default route
  * for q_quantiles — BIT-FOR-BIT against the unbounded exact
  * `percentile()` aggregate it replaces
  * (Profile.quantilesContExactPercentileTwin). The radix route selects
  * the two bracketing order statistics per (group, pct) and applies
  * Spark Percentile's own interpolation `(hi−pos)·v_lo +
  * (pos−lo)·v_hi`, so equality is exact, not approximate.
  */
class QuantilesContSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75), ("q95", 0.95))

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def compare(df: org.apache.spark.sql.DataFrame, clue: String): Unit = {
    val got = Profile.quantilesContBy(df, "g", col("v"), pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    val exp = Profile.quantilesContExactPercentileTwin(df, "g", "v", pcts)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == exp.keySet, s"$clue: group sets differ")
    for (g <- exp.keySet; i <- pcts.indices) {
      (got(g).isNullAt(i + 1), exp(g).isNullAt(i + 1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(bits(got(g).getDouble(i + 1)) == bits(exp(g).getDouble(i + 1)),
            s"$clue group $g pct ${pcts(i)._1}: " +
              s"${got(g).getDouble(i + 1)} vs ${exp(g).getDouble(i + 1)}")
        case (a, b) => fail(s"$clue group $g pct ${pcts(i)._1}: null mismatch $a/$b")
      }
      assert(got(g).getLong(pcts.size + 1) == exp(g).getLong(pcts.size + 1),
        s"$clue group $g: n mismatch")
    }
  }

  test("bit-identical to the percentile() twin on adversarial grouped doubles") {
    val rnd = new scala.util.Random(4242)
    val rows: Seq[(String, Option[Double])] = (0 until 2400).map { i =>
      val v: Option[Double] = rnd.nextInt(7) match {
        case 0 => Some(-math.exp(rnd.nextDouble() * 180 - 90))
        case 1 => Some(math.exp(rnd.nextDouble() * 180 - 90))
        case 2 => Some(rnd.nextInt(8).toDouble) // heavy duplication
        case 3 => Some(-0.0)
        case 4 => Some(rnd.nextDouble() * 4.9e-300)
        case 5 => None // percentile ignores nulls; n counts them
        case _ => Some(0.0)
      }
      ("g" + (i % 5), v)
    } :+ (("allnull", Option.empty[Double])) :+ (("single", Some(3.25)))
    compare(rows.toDF("g", "v"), "adversarial")
  }

  test("bit-identical to the twin on sf0.001 events (the q_quantiles shape)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type").as("g"), col("value").as("v"))
    compare(ev, "events")
  }

  test("group cap enforced") {
    val rows = (0 until 600).map(i => ("g" + i, i.toDouble))
    val e = intercept[IllegalArgumentException] {
      Profile.quantilesContBy(rows.toDF("g", "v"), "g", col("v"), pcts, maxGroups = 100)
    }
    assert(e.getMessage.contains("exceed the driver-bounded limit"))
  }
}
