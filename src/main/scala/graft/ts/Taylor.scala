package graft.ts

import org.apache.spark.sql.DataFrame

/** Rolling windowed Taylor-polynomial coefficient estimation
  * (reference featurize.py:300 taylor_coefs_one_column_grp,
  * featurize.py:428 windowed_taylor_coefs). Implemented next step.
  */
object Taylor {
  def windowedTaylorCoefs(
      df: DataFrame,
      columns: Seq[String],
      groupCols: Seq[String],
      orderCols: Seq[String],
      taylorDegree: Int,
      windowSizes: Seq[Int],
      windowAligns: Seq[String],
      ewSpans: Seq[Option[Int]],
      fillEdges: Boolean): FeatureResult =
    throw new NotImplementedError("Taylor.windowedTaylorCoefs: next milestone")
}
