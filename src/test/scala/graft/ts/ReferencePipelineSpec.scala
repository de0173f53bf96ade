package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end fidelity gate: golden files produced by running the
  * REFERENCE's own `featurize_data` (reichlab/timeseriesutils) over a
  * 3-group synthetic frame — rollmean + lags + trailing Taylor with
  * fill_edges — compared against our featurizeData column-for-column.
  */
class ReferencePipelineSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("featurizeData matches the reference pipeline on all feature columns") {
    val schema = StructType(Seq(
      StructField("location", IntegerType), StructField("date", IntegerType), StructField("y", DoubleType)))
    val input = spark.read.schema(schema).option("header", "true").csv(res("ref_pipeline_input.csv"))
    val result = Featurize.featurizeData(input, Seq("location"), Seq("date"), Seq(
      Featurize.Rollmean(Seq("y"), Seq(3)),
      Featurize.Lag(Seq("y"), Seq(1, 2)),
      Featurize.WindowedTaylorCoefs(Seq("y"), taylorDegree = 1, Seq(5), Seq("trailing"), Seq(None), fillEdges = true)))
    assert(result.featureNames == Seq("y_rollmean_w3", "y_lag1", "y_lag2",
      "y_taylor_d1_c0_w5t_sNone", "y_taylor_d1_c1_w5t_sNone"))

    val feats = result.featureNames
    val expSchema = StructType(schema.fields ++ feats.map(StructField(_, DoubleType)))
    val expected = spark.read.schema(expSchema).option("header", "true").csv(res("ref_pipeline_expected.csv"))

    val got = result.df.orderBy("location", "date").collect()
    val exp = expected.orderBy("location", "date").collect()
    assert(got.length == exp.length && got.length == 90)
    for ((g, e) <- got.zip(exp); (f, i) <- feats.zipWithIndex) {
      val gi = g.fieldIndex(f)
      val ei = e.fieldIndex(f)
      val key = s"loc=${g.getInt(0)} date=${g.getInt(1)} $f"
      (g.isNullAt(gi), e.isNullAt(ei)) match {
        case (true, true)   => ()
        case (false, false) =>
          assert(math.abs(g.getDouble(gi) - e.getDouble(ei)) < 1e-9,
            s"$key: got ${g.getDouble(gi)} expected ${e.getDouble(ei)}")
        case other => fail(s"$key: null mismatch $other")
      }
    }
  }
}
