package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ts.TimeOps

/** Monster-series measurement for the ts_anomaly threshold rework
  * (r20 judge item 3) — the [[MonsterRankStats]] methodology applied
  * to the seasonal anomaly pipeline's robust median/MAD stage:
  *
  *   - `bounded`    — the shipped route: decompose remainders →
  *                    s4 integer histogram → type-1 median/MAD rank
  *                    picks (TimeOps.robustZscore). Memory is bounded
  *                    by the REMAINDER VALUE RANGE (histogram rows),
  *                    never the series length; the row certifies a
  *                    10⁷-day single-key series costs a scan, not an
  *                    executor buffer.
  *   - `percentile` — the pre-r20 route for contrast: exact
  *                    `percentile().over(partitionBy(user))` buffers
  *                    EVERY remainder of the key in one window
  *                    evaluator (run at n/10 — this is the shape the
  *                    rework removed; expect it to be the wall).
  *
  * One user, one observation per daily bucket (ts = id · 86,400 s in
  * µs), deterministic trend + hash noise values, so the resample is
  * the identity spine and the decompose/threshold stages see the full
  * n — the honest monster shape for the per-key threshold.
  *
  * Usage: runMain graft.tools.MonsterAnomaly [n] [routes,csv]
  */
object MonsterAnomaly {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val routes = args.drop(1).headOption.map(_.split(",").toSet)
      .getOrElse(Set("bounded", "percentile"))
    val spark = SparkSession.builder()
      .appName("graft-monster-anomaly")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mkEvents(rows: Long) = {
      val dir = s"/tmp/graft_monster_anomaly_$rows"
      spark.range(rows)
        .select(lit(1L).as("user_id"), (col("id") * 86400000000L).as("ts_us"),
          (col("id") * 0.003 +
            (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 100.0)).as("value"))
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      df.count()
      df
    }

    def decompose(ev: org.apache.spark.sql.DataFrame) = {
      val daily = TimeOps.resampleFfill(ev, Seq("user_id"), "ts_us", 86400000000L,
          max(col("value")))
        .select("user_id", "bucket", "filled_value")
      val phase = pmod(expr("bucket div 86400000000") + 3, lit(7)).cast("int")
      TimeOps.seasonalDecompose(daily, "filled_value", Seq("user_id"), Seq("bucket"), 7, phase)
    }

    def time(tag: String, rows: Long)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cnt = mk.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"route":"$tag","n":$rows,"sec":$secs%.1f,"rows":$cnt}""")
    }

    if (routes("bounded")) {
      val ev = mkEvents(n)
      time("bounded", n) {
        TimeOps.robustZscore(decompose(ev), "remainder", Seq("user_id"), "rz", scale = 10000L)
          .where(abs(col("rz")) > lit(3.0))
      }
    }
    if (routes("percentile")) {
      val small = math.max(n / 10, 1L)
      val ev = mkEvents(small)
      time("percentile", small) {
        val dec = decompose(ev)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        val med = expr("percentile(remainder, cast(0.5 as double))").over(w)
        val dec2 = dec.withColumn("__med", med)
          .withColumn("__dev", abs(col("remainder") - col("__med")))
        val mad = expr("percentile(__dev, cast(0.5 as double))").over(w)
        dec2.withColumn("__mad", mad)
          .withColumn("rz",
            when(col("__mad") > 0,
              (col("remainder") - col("__med")) / (lit(1.4826) * col("__mad"))))
          .where(abs(col("rz")) > lit(3.0))
      }
    }
    spark.stop()
  }
}
