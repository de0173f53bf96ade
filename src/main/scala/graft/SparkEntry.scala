package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{Featurize, OracleGen, Taylor}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every (queries, oracleSql) pair:
  *  - identical column aliases on both sides (driver sorts by name);
  *  - deterministic trailing ORDER BY on key columns;
  *  - floating-point columns either bit-identical by construction
  *    (expressions generated with the same association order, see
  *    ts.OracleGen) or rounded to 4dp on both sides when the engines'
  *    aggregation orders legitimately differ (global sums).
  */
object SparkEntry {

  // events: the time-series workhorse. group=user_id, order=(ts_us,event_id).
  private val evGroup = Seq("user_id")
  private val evOrder = Seq("ts_us", "event_id")
  /** DuckDB twin of Featurize.seriesWindow on events. */
  private val evOver = OracleGen.over(Seq("user_id"), Seq("epoch_us(ts)", "event_id"))
  private val evKeys = "user_id, ts_us, event_id"
  /** events.ts is TIMESTAMP(NANOS) in parquet; both engines use int64
    * epoch µs (see Tables.events for why not ns). */
  private val evFrom = "select user_id, epoch_us(ts) as ts_us, event_id, value from events"

  /** Flagship: lag + rollmean feature pipeline on sf0.001 events. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_rollmean")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "ts_lag" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Featurize.lagFeatures(ev, Seq("value"), evGroup, evOrder, Seq(1, 2, 7))
        .df.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_rollmean" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      val r1 = Featurize.rollmean(ev, Seq("value"), evGroup, evOrder, Seq(7))
      val r2 = Featurize.rollmean(r1.df, Seq("value"), evGroup, evOrder, Seq(28), Some(1))
      r2.df.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_horizon_wide" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Featurize.horizonTargets(ev, Seq("value"), evGroup, evOrder, Seq(1, 7), "wide")
        .df.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_horizon_long" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Featurize.horizonTargets(ev, Seq("value"), evGroup, evOrder, Seq(1, 2, 3), "long")
        .df.orderBy("horizon", "user_id", "ts_us", "event_id")
    },
    "ts_taylor_trailing" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Taylor.windowedTaylorCoefs(ev, Seq("value"), evGroup, evOrder,
        taylorDegree = 2, Seq(14), Seq("trailing"), Seq(None), fillEdges = false)
        .df.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_taylor_centered" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Taylor.windowedTaylorCoefs(ev, Seq("value"), evGroup, evOrder,
        taylorDegree = 1, Seq(21), Seq("centered"), Seq(None), fillEdges = true)
        .df.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_taylor_ew" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      Taylor.windowedTaylorCoefs(ev, Seq("value"), evGroup, evOrder,
        taylorDegree = 1, Seq(9), Seq("trailing"), Seq(Some(7)), fillEdges = true)
        .df.orderBy("user_id", "ts_us", "event_id")
    },
  )

  private def taylorOracle(spec: ts.TaylorBasis.Spec): String = {
    val exprs = OracleGen.taylorExprs(spec, evOver, Seq("user_id")).mkString(",\n ")
    s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $exprs\nfrom events\norder by $evKeys"
  }

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """select l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) as sum_qty,
        | round(sum(l_extendedprice), 4) as sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) as sum_disc_price,
        | round(avg(l_quantity), 4) as avg_qty,
        | round(avg(l_discount), 4) as avg_disc,
        | count(*) as count_order
        |from lineitem
        |where l_shipdate <= timestamp '1998-09-02 00:00:00'
        |group by l_returnflag, l_linestatus
        |order by l_returnflag, l_linestatus""".stripMargin,
    "ts_lag" -> {
      val lags = Seq(1, 2, 7).map(k => OracleGen.lagExpr("value", k, evOver)).mkString(",\n ")
      s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $lags\nfrom events\norder by $evKeys"
    },
    "ts_rollmean" -> {
      val r7 = OracleGen.rollmeanExpr("value", 7, 7, evOver)
      val r28 = OracleGen.rollmeanExpr("value", 28, 1, evOver)
      s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $r7,\n $r28\nfrom events\norder by $evKeys"
    },
    "ts_horizon_wide" -> {
      val leads = Seq(1, 7).map(h => OracleGen.leadExpr("value", h, evOver, s"value_target$h")).mkString(",\n ")
      s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $leads\nfrom events\norder by $evKeys"
    },
    "ts_horizon_long" -> {
      val parts = Seq(1, 2, 3).map { h =>
        val lead = OracleGen.leadExpr("value", h, evOver, "value_target")
        s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $lead, $h as horizon\nfrom events"
      }
      parts.mkString("", "\nunion all\n", s"\norder by horizon, $evKeys")
    },
    "ts_taylor_trailing" -> taylorOracle(
      ts.TaylorBasis.Spec("value", 2, 14, "trailing", None, fillEdges = false)),
    "ts_taylor_centered" -> taylorOracle(
      ts.TaylorBasis.Spec("value", 1, 21, "centered", None, fillEdges = true)),
    "ts_taylor_ew" -> taylorOracle(
      ts.TaylorBasis.Spec("value", 1, 9, "trailing", Some(7), fillEdges = true)),
  )
}
