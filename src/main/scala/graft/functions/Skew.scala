package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for hot aggregation keys. At 100 TB a handful
  * of keys holding 1%+ of the data serialize their reducers; two-stage
  * salted aggregation restores parallelism for algebraic aggregates.
  */
object Skew {

  /** Algebraic aggregate spec: the partial (per-salt) expression and
    * the merge expression applied to the partial column.
    */
  final case class AlgebraicAgg(name: String, partial: Column => Column, merge: Column => Column)

  def sumAgg(c: String, as: String): AlgebraicAgg =
    AlgebraicAgg(as, v => sum(v), p => sum(p))
  def countAgg(as: String): AlgebraicAgg =
    AlgebraicAgg(as, v => count(lit(1)), p => sum(p))
  def minAgg(c: String, as: String): AlgebraicAgg = AlgebraicAgg(as, v => min(v), p => min(p))
  def maxAgg(c: String, as: String): AlgebraicAgg = AlgebraicAgg(as, v => max(v), p => max(p))

  /** Two-stage salted groupBy: stage 1 aggregates on
    * (keys…, salt = hash(row) % nSalts) spreading each hot key over
    * `nSalts` reducers; stage 2 merges the partials per key. Only valid
    * for algebraic aggregates (sum/count/min/max — anything with an
    * associative merge). Same result as a direct groupBy; ~2× shuffle
    * rows of the PARTIAL size (tiny) instead of one reducer per hot key.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      aggs: Seq[(AlgebraicAgg, String)],
      nSalts: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts.toLong)))
    val partials = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._1.partial(col(valueCol)).as(s"__p_${aggs.head._1.name}"),
        aggs.tail.map { case (a, _) => a.partial(col(valueCol)).as(s"__p_${a.name}") }: _*)
    partials
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._1.merge(col(s"__p_${aggs.head._1.name}")).as(aggs.head._2),
        aggs.tail.map { case (a, as) => a.merge(col(s"__p_${a.name}")).as(as) }: _*)
  }
}
