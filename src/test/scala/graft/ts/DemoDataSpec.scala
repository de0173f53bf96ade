package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The switch-over proof: the reference's own demo dataset
  * (docs/demo_data.csv — 51 locations × ~9 months of hospitalization
  * rates) run through the reference's featurize_data (golden CSV) and
  * through our featurizeData, compared value-for-value on ~14k rows —
  * a realistic epi-forecasting feature spec (weekly rollmean, 7/14-day
  * lags, degree-2 trailing Taylor, 7-day-ahead target).
  */
class DemoDataSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("reference demo pipeline: 14k-row epi dataset matches on every feature") {
    val inSchema = StructType(Seq(
      StructField("location", StringType), StructField("date", StringType), StructField("rate", DoubleType)))
    val input = spark.read.schema(inSchema).option("header", "true").csv(res("demo_input.csv"))
    val result = Featurize.featurizeData(input, Seq("location"), Seq("date"), Seq(
      Featurize.Rollmean(Seq("rate"), Seq(7)),
      Featurize.Lag(Seq("rate"), Seq(7, 14)),
      Featurize.WindowedTaylorCoefs(Seq("rate"), taylorDegree = 2, Seq(14), Seq("trailing"), Seq(None), fillEdges = false),
      Featurize.HorizonTargets(Seq("rate"), Seq(7), "wide")))
    val feats = result.featureNames ++ Seq("rate_target7")
    val expSchema = StructType(inSchema.fields ++ feats.map(StructField(_, DoubleType)))
    val expected = spark.read.schema(expSchema).option("header", "true").csv(res("demo_expected.csv"))

    val got = result.df.orderBy("location", "date").collect()
    val exp = expected.orderBy("location", "date").collect()
    assert(got.length == exp.length && got.length == 13974)
    var checked = 0
    for ((g, e) <- got.zip(exp); f <- feats) {
      val gi = g.fieldIndex(f)
      val ei = e.fieldIndex(f)
      (g.isNullAt(gi), e.isNullAt(ei)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(math.abs(g.getDouble(gi) - e.getDouble(ei)) < 1e-9,
            s"loc=${g.getString(0)} date=${g.getString(1)} $f: ${g.getDouble(gi)} vs ${e.getDouble(ei)}")
          checked += 1
        case other => fail(s"loc=${g.getString(0)} date=${g.getString(1)} $f: null mismatch $other")
      }
    }
    assert(checked > 80000, s"expected >80k non-null comparisons, got $checked")
  }
}
