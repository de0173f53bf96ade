package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ts.TimeOps

/** Monster-series measurement for the r19c diagnostics family — the
  * [[MonsterTheilSen]] methodology applied to the rank-statistics
  * kernel (spearman/pettitt/runs/cox ride ONE RankStatsAggKernel
  * call), the seasonal Sen kernel, and the windowed Ljung-Box:
  *
  *   - `auto`   — each stat at its DEFAULT budget (pointBudget 4472
  *                per series / per season): the contract is that a
  *                single 10⁷-point series costs the sampler scan plus
  *                a bounded kernel call, never an unbounded collect.
  *   - `exact`  — autoMaxPairs = None at a deliberately smaller n:
  *                the whole series is collected into ONE aggregation
  *                buffer (the r11 lesson — this is why the sampler is
  *                the default), so this row bounds what "exact" costs.
  *   - `ljungbox` — NO sampler exists here by design: the plan is a
  *                single-series window sort + 10 lag frames + one
  *                groupBy, all linear in n; the row shows the window
  *                route absorbs a monster series without a budget.
  *
  * Deterministic value stream (trend + hash noise), same as the
  * Theil-Sen tool, so reruns are comparable; rows land in SCALING.md.
  *
  * Usage: runMain graft.tools.MonsterRankStats [n] [routes,csv]
  */
object MonsterRankStats {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val routes = args.drop(1).headOption.map(_.split(",").toSet)
      .getOrElse(Set("auto", "exact", "ljungbox"))
    val spark = SparkSession.builder()
      .appName("graft-monster-rankstats")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/tmp/graft_monster_$n"
    spark.range(n)
      .select(lit(1L).as("user_id"), col("id").as("ts_us"), col("id").as("event_id"),
        (col("id") * 3.0 +
          (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 100.0)).as("value"))
      .repartition(32)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    df.count()
    val phase = pmod(col("ts_us"), lit(7)).cast("int")
    def time(tag: String, col1: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = mk.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val v = rows.headOption.map(r => r.get(r.fieldIndex(col1))).orNull
      println(f"""{"route":"$tag","n":$n,"sec":$secs%.1f,"$col1":"$v"}""")
    }
    if (routes("auto")) {
      time("spearman_auto", "rho")(
        TimeOps.spearman(df, "value", "ts_us", Seq("user_id")))
      time("pettitt_auto", "k_stat")(
        TimeOps.pettitt(df, "value", "ts_us", Seq("user_id")))
      time("runs_auto", "z")(
        TimeOps.runsTest(df, "value", "ts_us", Seq("user_id")))
      time("coxstuart_auto", "z")(
        TimeOps.coxStuart(df, "value", "ts_us", Seq("user_id")))
      time("sen_seasonal_auto", "sen_slope")(
        TimeOps.theilSenSeasonal(df, "value", "ts_us", Seq("user_id"), phase))
    }
    if (routes("exact"))
      time("spearman_exact_unsampled", "rho")(
        TimeOps.spearman(df, "value", "ts_us", Seq("user_id"), autoMaxPairs = None))
    if (routes("ljungbox"))
      time("ljungbox_window", "q_lb")(
        TimeOps.ljungBox(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
    // the window-route stationarity/complexity trio: like ljungbox,
    // NO sampler by design — linear single-series window passes
    if (routes("window")) {
      time("adf_window", "t_stat")(
        TimeOps.adfTest(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
      time("kpss_window", "eta")(
        TimeOps.kpss(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
      time("perm_entropy_window", "perm_entropy")(
        TimeOps.permEntropy(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
      time("kpss_hac_window", "eta")(
        TimeOps.kpssHac(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
    }
    // r20c additions: hurst is a WINDOW route (the 4×-exploded block
    // frames are ≤ 64 rows each — linear, no budget needed); sampen is
    // PREFIX-capped by contract (first 2,048 points), so the monster
    // cost is the row_number spine scan plus a bounded pair join.
    if (routes("hurst"))
      time("hurst_window", "hurst")(
        TimeOps.hurst(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
    if (routes("dfa"))
      time("dfa_window", "alpha")(
        TimeOps.dfa(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
    if (routes("sampen"))
      time("sampen_prefix", "sampen")(
        TimeOps.sampleEntropy(df, "value", Seq("user_id"), Seq("ts_us", "event_id")))
    spark.stop()
  }
}
