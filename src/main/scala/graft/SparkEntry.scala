package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{Featurize, OracleGen, Taylor, TimeOps}

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

  /** Flagship: the full featurize_data pipeline on sf0.001 events. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_pipeline")(spark, "/root/testdata/sf0.001")

  /** featurize_data spec shared by ts_pipeline and ts_train_matrix. */
  private val pipelineFeatures = Seq(
    Featurize.Lag(Seq("value"), Seq(1, 7)),
    Featurize.Rollmean(Seq("value"), Seq(7)),
    Featurize.WindowedTaylorCoefs(Seq("value"), taylorDegree = 1, Seq(9), Seq("trailing"), Seq(None), fillEdges = false),
    Featurize.HorizonTargets(Seq("value"), Seq(7), "wide"))

  private def pipelineDf(s: SparkSession, dir: String): (DataFrame, Seq[String]) = {
    val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
    val res = Featurize.featurizeData(ev, evGroup, evOrder, pipelineFeatures)
    (res.df, res.featureNames)
  }

  private def pipelineSelectExprs: Seq[String] = {
    val lags = Seq(1, 7).map(k => OracleGen.lagExpr("value", k, evOver))
    val roll = OracleGen.rollmeanExpr("value", 7, 7, evOver)
    val taylor = OracleGen.taylorExprs(
      ts.TaylorBasis.Spec("value", 1, 9, "trailing", None, fillEdges = false), evOver, Seq("user_id"))
    val target = OracleGen.leadExpr("value", 7, evOver, "value_target7")
    lags ++ Seq(roll) ++ taylor ++ Seq(target)
  }

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
    "ts_pipeline" -> { (s, dir) =>
      pipelineDf(s, dir)._1.orderBy("user_id", "ts_us", "event_id")
    },
    "ts_train_matrix" -> { (s, dir) =>
      val (df, feats) = pipelineDf(s, dir)
      df.na.drop(feats :+ "value_target7").orderBy("user_id", "ts_us", "event_id")
    },
    "ts_sessionize" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id")
      TimeOps.sessionize(ev, evGroup, evOrder, "ts_us", gapMicros = 1800000000L)
        .orderBy("user_id", "ts_us", "event_id")
    },
    "ts_tumbling" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.withColumn("day_us", TimeOps.tumblingBucket("ts_us", 86400000000L))
        .groupBy("user_id", "day_us")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
        .orderBy("user_id", "day_us")
    },
    "ts_asof" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "event_type", "value")
      TimeOps.asofCarry(ev, evGroup, evOrder, col("event_type") === "purchase", "value", "last_purchase_value")
        .select("user_id", "ts_us", "event_id", "value", "last_purchase_value")
        .orderBy("user_id", "ts_us", "event_id")
    },
    "ts_resample" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "value")
      TimeOps.resampleFfill(ev, Seq("user_id"), "ts_us", 86400000000L, max(col("value")))
        .orderBy("user_id", "bucket")
    },
    "ts_ewma_trunc" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      TimeOps.ewmaTruncated(ev, "value", evGroup, evOrder, alpha = 0.2, k = 32, out = "ewma_t")
        .orderBy("user_id", "ts_us", "event_id")
    },
    "ts_ewma" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts_us", "event_id", "value")
      TimeOps.ewma(ev, "value", evGroup, evOrder, alpha = 0.2)
        .orderBy("user_id", "ts_us", "event_id")
    },
    "q3_join" -> { (s, dir) =>
      val cut = lit("1995-06-15").cast("timestamp")
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    "q_topn" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
      val spend = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(round(sum("o_totalprice"), 4).as("spend"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey").orderBy(col("spend").desc, col("c_custkey"))
      spend.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },
    "q_quantiles" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.groupBy("event_type").agg(
        round(expr("percentile(value, 0.25)"), 4).as("q25"),
        round(expr("percentile(value, 0.5)"), 4).as("q50"),
        round(expr("percentile(value, 0.75)"), 4).as("q75"),
        round(expr("percentile(value, 0.95)"), 4).as("q95"),
        count(lit(1)).as("n"))
        .orderBy("event_type")
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
    "ts_pipeline" ->
      s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n ${pipelineSelectExprs.mkString(",\n ")}\nfrom events\norder by $evKeys",
    "ts_train_matrix" -> {
      val feats = Seq("value_lag1", "value_lag7", "value_rollmean_w7",
        "value_taylor_d1_c0_w9t_sNone", "value_taylor_d1_c1_w9t_sNone", "value_target7")
      val notNull = feats.map(f => s"$f is not null").mkString(" and ")
      s"select * from (select user_id, epoch_us(ts) as ts_us, event_id, value,\n ${pipelineSelectExprs.mkString(",\n ")}\nfrom events)\nwhere $notNull\norder by $evKeys"
    },
    "ts_sessionize" ->
      s"""select user_id, ts_us, event_id,
         | cast(sum(is_new) over (partition by user_id order by ts_us, event_id
         |   rows between unbounded preceding and current row) as bigint) as session_id
         |from (
         |  select user_id, epoch_us(ts) as ts_us, event_id,
         |   case when lag(epoch_us(ts), 1) over $evOver is null
         |     or epoch_us(ts) - lag(epoch_us(ts), 1) over $evOver > 1800000000 then 1 else 0 end as is_new
         |  from events)
         |order by $evKeys""".stripMargin,
    "ts_tumbling" ->
      """select user_id, (epoch_us(ts) - epoch_us(ts) % 86400000000) as day_us,
        | count(*) as n_events, round(sum(value), 4) as sum_value
        |from events
        |group by user_id, (epoch_us(ts) - epoch_us(ts) % 86400000000)
        |order by user_id, day_us""".stripMargin,
    "ts_asof" ->
      """select e.user_id, epoch_us(e.ts) as ts_us, e.event_id, e.value, p.value as last_purchase_value
        |from events e
        |asof left join (select user_id, ts, value from events where event_type = 'purchase') p
        |  on e.user_id = p.user_id and e.ts >= p.ts
        |order by e.user_id, ts_us, e.event_id""".stripMargin,
    "ts_resample" ->
      """with pb as (
        |  select user_id, (epoch_us(ts) - epoch_us(ts) % 86400000000) as bucket, max(value) as bucket_value
        |  from events group by 1, 2),
        |bounds as (select user_id, min(bucket) as b0, max(bucket) as b1 from pb group by 1),
        |spine as (select user_id, unnest(generate_series(b0, b1, 86400000000)) as bucket from bounds),
        |j as (select s.user_id, s.bucket, pb.bucket_value
        |      from spine s left join pb on s.user_id = pb.user_id and s.bucket = pb.bucket)
        |select user_id, bucket, bucket_value,
        | last_value(bucket_value ignore nulls) over (partition by user_id order by bucket
        |   rows between unbounded preceding and current row) as filled_value
        |from j
        |order by user_id, bucket""".stripMargin,
    "ts_ewma_trunc" -> {
      val e = OracleGen.ewmaTruncExpr("value", 0.2, 32, evOver, "ewma_t")
      s"select user_id, epoch_us(ts) as ts_us, event_id, value,\n $e\nfrom events\norder by $evKeys"
    },
    "q3_join" ->
      """select l_orderkey, epoch_us(o_orderdate) as od_us,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) as revenue
        |from lineitem
        |join orders on l_orderkey = o_orderkey
        |join customer on o_custkey = c_custkey
        |where c_mktsegment = 'BUILDING'
        |  and o_orderdate < timestamp '1995-06-15 00:00:00'
        |  and l_shipdate > timestamp '1995-06-15 00:00:00'
        |group by l_orderkey, epoch_us(o_orderdate)
        |order by revenue desc, l_orderkey
        |limit 10""".stripMargin,
    "q_topn" ->
      """select * from (
        |  select c_nationkey, c_custkey, spend,
        |    row_number() over (partition by c_nationkey order by spend desc, c_custkey) as rn
        |  from (select c_nationkey, c_custkey, round(sum(o_totalprice), 4) as spend
        |        from orders join customer on o_custkey = c_custkey
        |        group by c_nationkey, c_custkey))
        |where rn <= 3
        |order by c_nationkey, rn""".stripMargin,
    "q_quantiles" ->
      """select event_type,
        | round(quantile_cont(value, 0.25), 4) as q25,
        | round(quantile_cont(value, 0.5), 4) as q50,
        | round(quantile_cont(value, 0.75), 4) as q75,
        | round(quantile_cont(value, 0.95), 4) as q95,
        | count(*) as n
        |from events
        |group by event_type
        |order by event_type""".stripMargin,
  )
}
