package graft.ts

import org.apache.spark.sql.DataFrame

/** Periodogram dominant-frequency features (reference featurize.py:519
  * domfreq_one_window, :557 domfreq_one_column_grp, :604 domfreq).
  * Implemented in a later milestone.
  */
object DomFreq {
  def domfreq(
      df: DataFrame,
      columns: Seq[String],
      groupCols: Seq[String],
      orderCols: Seq[String],
      windowSizes: Seq[Int],
      windowAligns: Seq[String],
      nDomfreq: Int,
      fs: Double): FeatureResult =
    throw new NotImplementedError("DomFreq.domfreq: later milestone")
}
