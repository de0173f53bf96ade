package graft.ts

/** DuckDB SQL emitters that mirror Featurize's Column expressions
  * term-for-term. The correctness gate hash-compares our parquet output
  * against DuckDB running this SQL, so floating-point expressions must
  * associate identically on both sides: every emitter here is written as
  * the same left-fold over the same term order as its Featurize twin.
  */
object OracleGen {

  /** `PARTITION BY g ORDER BY o` body shared by all window exprs. */
  def over(groupCols: Seq[String], orderCols: Seq[String]): String = {
    val part = if (groupCols.isEmpty) "" else s"partition by ${groupCols.mkString(", ")} "
    s"($part" + s"order by ${orderCols.mkString(", ")})"
  }

  /** Mirrors Featurize.lagFeatures. */
  def lagExpr(c: String, k: Int, ov: String): String = s"lag($c, $k) over $ov as ${c}_lag$k"

  /** Mirrors Featurize.rollmean: same left-to-right coalesce-sum. */
  def rollmeanExpr(c: String, w: Int, minP: Int, ov: String): String = {
    def term(i: Int): String = if (i == 0) c else s"lag($c, $i) over $ov"
    val total = (0 until w).map(i => s"coalesce(cast(${term(i)} as double), 0.0)").reduceLeft((a, b) => s"($a + $b)")
    val cnt = (0 until w).map(i => s"(case when ${term(i)} is not null then 1 else 0 end)").reduceLeft((a, b) => s"($a + $b)")
    s"case when $cnt >= $minP then $total / $cnt end as ${c}_rollmean_w$w"
  }

  /** Mirrors Featurize.horizonTargets wide layout. */
  def leadExpr(c: String, h: Int, ov: String, alias: String): String =
    s"lead($c, $h) over $ov as $alias"

  /** Render a double exactly as Spark's `lit(d)` does (Java
    * Double.toString round-trips), so literals match bit-for-bit.
    */
  def litD(d: Double): String =
    if (d == Math.rint(d) && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
}
