package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for hot aggregation keys. At 100 TB a handful
  * of keys holding 1%+ of the data serialize their reducers; two-stage
  * salted aggregation restores parallelism for algebraic aggregates.
  */
object Skew {

  /** Algebraic aggregate spec: `partial` is the per-salt aggregate
    * expression (over the source column it closes over), `merge` the
    * expression applied to the partial column in stage 2.
    */
  final case class AlgebraicAgg(name: String, partial: Column, merge: Column => Column)

  def sumAgg(c: String, as: String): AlgebraicAgg = AlgebraicAgg(as, sum(col(c)), p => sum(p))
  def countAgg(as: String): AlgebraicAgg = AlgebraicAgg(as, count(lit(1)), p => sum(p))
  def minAgg(c: String, as: String): AlgebraicAgg = AlgebraicAgg(as, min(col(c)), p => min(p))
  def maxAgg(c: String, as: String): AlgebraicAgg = AlgebraicAgg(as, max(col(c)), p => max(p))

  /** Two-stage salted groupBy: stage 1 aggregates on
    * (keys…, salt = hash(row) % nSalts) spreading each hot key over
    * `nSalts` reducers; stage 2 merges the partials per key. Only valid
    * for algebraic aggregates (sum/count/min/max — anything with an
    * associative merge). ~2× shuffle rows of the PARTIAL size (tiny)
    * instead of one reducer per hot key.
    *
    * FP caveat: for floating-point sums the two-stage merge changes the
    * association order, so results can differ from a direct groupBy by
    * normal summation rounding (~ulp-level). Integral aggregates and
    * min/max are exactly equal.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[AlgebraicAgg],
      nSalts: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts.toLong)))
    val partials = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial.as(s"__p_${aggs.head.name}"),
        aggs.tail.map(a => a.partial.as(s"__p_${a.name}")): _*)
    partials
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(col(s"__p_${aggs.head.name}")).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(s"__p_${a.name}")).as(a.name)): _*)
  }
}
