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
}
