package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: the pipeline health-check scan. One aggregation
  * pass computes per-column row/null counts, min/max/mean/std, and
  * exact distinct counts for every requested numeric column, then the
  * single result row unpivots into one row per column. Everything is
  * map-side combinable except the exact distincts (Spark plans those
  * with one Expand over the same scan); at 100 TB swap
  * `approx_count_distinct` exactly like the quantile family documents.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    def d(c: String): Column = col(c).cast("double")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_nonnull"),
        min(d(c)).as(s"__${c}_min"),
        max(d(c)).as(s"__${c}_max"),
        round(avg(d(c)), 4).as(s"__${c}_mean"),
        round(stddev_samp(d(c)), 4).as(s"__${c}_std"),
        countDistinct(col(c)).as(s"__${c}_distinct"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nonnull")).as("n_null"),
        col(s"__${c}_min").as("min"),
        col(s"__${c}_max").as("max"),
        col(s"__${c}_mean").as("mean"),
        col(s"__${c}_std").as("std"),
        col(s"__${c}_distinct").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * aggregation pass: the k·(k+3)/2 algebraic sums (per-column sum +
    * sum-of-squares, per-pair cross sum) are all map-side combinable,
    * then each pair's r is arithmetic on the single result row —
    * feature-redundancy screening at dataset-profile cost. Rows where
    * ANY requested column is null are excluded up front (listwise
    * deletion) so every pair shares one n.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    def d(c: String): Column = col(c).cast("double")
    val clean = df.na.drop(cols)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      cols.flatMap(c => Seq(sum(d(c)).as(s"__s_$c"), sum(d(c) * d(c)).as(s"__ss_$c"))) ++
        pairs.map { case (a, b) => sum(d(a) * d(b)).as(s"__sp_${a}__$b") }
    val one = clean.agg(count(lit(1)).cast("double").as("__n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("__n")
      val sx = col(s"__s_$a"); val sy = col(s"__s_$b")
      val sxx = col(s"__ss_$a"); val syy = col(s"__ss_$b")
      val sxy = col(s"__sp_${a}__$b")
      // degenerate gate: zero variance (constant column) makes r
      // undefined, and ε-negative FP cancellation would make DuckDB's
      // sqrt raise where Spark yields NaN — null on both sides instead
      // (mirrored in the stats_corr oracle SQL).
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      struct(
        lit(a).as("col_a"),
        lit(b).as("col_b"),
        round(when(vx <= 0 || vy <= 0, lit(null))
          .otherwise((n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy))), 4)
          .as("corr"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_a", "col_b")
  }
}
