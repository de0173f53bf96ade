package graft.streaming

import graft.SparkSpec
import graft.ts.Featurize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingFeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def evs(user: Long, n: Int): Seq[Ev] =
    (0 until n).map(i => Ev(user, i.toLong * 1000000, math.sin(i * 0.5) * 10 + user))

  test("streaming rollingFeatures equals batch lag+rollmean across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.rollingFeatures(input.toDS(), w = 4)
      .writeStream.format("memory").queryName("roll_out").outputMode("append").start()
    try {
      val all = evs(1, 10) ++ evs(2, 7)
      // three micro-batches, interleaving keys, in-order per key
      input.addData(all.filter(e => e.ts_us < 3000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(e => e.ts_us >= 3000000 && e.ts_us < 6000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(e => e.ts_us >= 6000000): _*)
      q.processAllAvailable()

      val streamed = spark.table("roll_out")
        .select("user_id", "ts_us", "value_lag1", "value_rollmean")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

      val batchDf = all.toDF("user_id", "ts_us", "value")
      val lagged = Featurize.lagFeatures(batchDf, Seq("value"), Seq("user_id"), Seq("ts_us"), Seq(1))
      val rolled = Featurize.rollmean(lagged.df, Seq("value"), Seq("user_id"), Seq("ts_us"), Seq(4))
      val batch = rolled.df
        .select("user_id", "ts_us", "value_lag1", "value_rollmean_w4")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamingRollTheilSen equals batch rollTheilSen bit-for-bit across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val w = 5
    val q = StreamingFeaturize.streamingRollTheilSen(input.toDS(), w)
      .writeStream.format("memory").queryName("rollsen_out").outputMode("append").start()
    try {
      // noisy + one spike so the median pick actually works
      val all = (0 until 18).map(i =>
        Ev(1, i.toLong * 1000000,
          if (i == 9) 1e6 else 2.0 * i + math.sin(i * 0.7))) ++ evs(2, 8)
      input.addData(all.filter(_.ts_us < 5000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(e => e.ts_us >= 5000000 && e.ts_us < 11000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 11000000): _*)
      q.processAllAvailable()
      val streamed = spark.table("rollsen_out")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      val batch = graft.ts.TimeOps.rollTheilSen(
          all.toDF("user_id", "ts_us", "value"),
          "value", "ts_us", Seq("user_id"), Seq("ts_us"), w)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(streamed == batch, s"stream/batch divergence:\n${streamed.diff(batch)}")
    } finally q.stop()
  }

  test("streamingPack equals batch packFragments across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(5)
    // words so tokenCount sees real token streams; lengths 0..24 cover
    // empty docs, in-bin docs, and boundary-crossing docs at C=512/32
    // shards (batch defaults) — use small capacity via direct batch
    // comparison instead: both sides share defaults, so lengths must
    // be big enough to cross 512; mix in a monster doc
    val docs = (0L until 120L).map { id =>
      val n = if (id == 17L) 1400 else rng.nextInt(80)
      Doc(id, (0 until n).map(i => s"w$i").mkString(" "))
    }
    val input = MemoryStream[Doc]
    val q = StreamingFeaturize.streamingPack(input.toDS())
      .writeStream.format("memory").queryName("pack_out").outputMode("append").start()
    try {
      docs.grouped(40).foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("pack_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = graft.functions.Packing.packFragments(
        docs.toDF("doc_id", "text"), "doc_id",
        graft.functions.TextOps.tokenCount(col("text")), capacity = 512L, shards = 32)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed == batch, "stream fragments must equal the batch packing exactly")
      assert(streamed.exists(_._1 == 17L) &&
        streamed.count(_._1 == 17L) >= 3, "the monster doc must span multiple bins")
    } finally q.stop()
  }

  test("exact twins fail fast on duplicate or late timestamps (order contract)") {
    implicit val sqlCtx = spark.sqlContext
    // duplicate (user_id, ts_us) inside one micro-batch: batch order is
    // ts alone, so there is no order both twins agree on — must throw,
    // not silently emit features for an arbitrary order
    val dupIn = MemoryStream[Ev]
    val dupQ = StreamingFeaturize.streamingEwma(dupIn.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("dup_out").outputMode("append").start()
    try {
      dupIn.addData(Ev(1, 1000000, 1.0), Ev(1, 1000000, 2.0))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        dupQ.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("strictly increasing"))),
        s"expected the order-contract failure, got: ${ex.getMessage}")
    } finally dupQ.stop()
    // late cross-batch arrival for streamingTaylor: same contract
    val lateIn = MemoryStream[Ev]
    val spec = graft.ts.TaylorBasis.Spec("value", 1, 5, "trailing", None, fillEdges = true)
    val lateQ = StreamingFeaturize.streamingTaylor(lateIn.toDS(), spec)
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      lateIn.addData(Ev(1, 5000000, 1.0))
      lateQ.processAllAvailable()
      lateIn.addData(Ev(1, 2000000, 2.0)) // late: before the last processed ts
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        lateQ.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("strictly increasing"))),
        s"expected the order-contract failure, got: ${ex.getMessage}")
    } finally lateQ.stop()
  }

  test("streamingEwma equals the batch recursive EWMA across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.streamingEwma(input.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      val all = evs(1, 12) ++ evs(2, 8)
      input.addData(all.filter(_.ts_us < 4000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 4000000): _*)
      q.processAllAvailable()
      val streamed = spark.table("ewma_out")
        .select("user_id", "ts_us", "value_rollmean")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.ts.TimeOps.ewma(
          all.toDF("user_id", "ts_us", "value"), "value", Seq("user_id"), Seq("ts_us"), alpha = 0.2)
        .select("user_id", "ts_us", "ewma")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch, "streaming recurrence must be bit-identical to the batch scan")
    } finally q.stop()
  }

  test("streamingEwmVol equals the batch EWM variance scan across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.streamingEwmVol(input.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("ewmvol_out").outputMode("append").start()
    try {
      val all = evs(1, 12) ++ evs(2, 8)
      input.addData(all.filter(_.ts_us < 4000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 4000000): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))
      val streamed = spark.table("ewmvol_out")
        .select("user_id", "ts_us", "value", "ewma", "ewm_var", "ewm_std")
        .collect().map(key).toSet
      val batch = graft.ts.TimeOps.ewmVol(
          all.toDF("user_id", "ts_us", "value"), "value", Seq("user_id"), Seq("ts_us"), alpha = 0.2)
        .select("user_id", "ts_us", "value", "ewma", "ewm_var", "ewm_std")
        .collect().map(key).toSet
      assert(streamed == batch, "streaming EWM variance must be bit-identical to the batch scan")
      // volatility sanity: a constant series decays to zero variance
      val const = (0 until 6).map(i => Ev(9, i.toLong * 1000, 5.0))
      val b2 = graft.ts.TimeOps.ewmVol(const.toDF("user_id", "ts_us", "value"),
        "value", Seq("user_id"), Seq("ts_us"), alpha = 0.2)
        .select("ewm_var").collect().map(_.getDouble(0))
      assert(b2.forall(v => math.abs(v) < 1e-9), b2.mkString(","))
    } finally q.stop()
  }

  test("streamingCusum equals the batch CUSUM across micro-batches and alarms") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.streamingCusum(input.toDS(), target = 0.0, slack = 0.5, threshold = 20.0)
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      // user 1 drifts upward mid-stream; user 2 stays quiet
      val all = (0 until 16).map(i =>
        Ev(1, i.toLong * 1000000, if (i < 8) 0.0 else 10.0)) ++
        (0 until 10).map(i => Ev(2, i.toLong * 1000000, 0.0))
      input.addData(all.filter(_.ts_us < 6000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 6000000): _*)
      q.processAllAvailable()
      val streamed = spark.table("cusum_out")
        .select("user_id", "ts_us", "cusum_pos", "cusum_neg", "cusum_alarm")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toSet
      val batch = graft.ts.TimeOps.cusum(
          all.map(e => (e.user_id, e.ts_us, e.value)).toDF("user_id", "ts_us", "value"),
          "value", Seq("user_id"), Seq("ts_us"), target = 0.0, slack = 0.5, threshold = 20.0)
        .select("user_id", "ts_us", "cusum_pos", "cusum_neg", "cusum_alarm")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toSet
      assert(streamed == batch, "streaming CUSUM must be bit-identical to the batch scan")
      assert(streamed.exists(_._5), "the drifting series must alarm")
      assert(streamed.filter(_._1 == 2L).forall(!_._5), "the quiet series must not alarm")
    } finally q.stop()
  }

  test("streamingTrend equals the batch expanding OLS across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.streamingTrend(input.toDS())
      .writeStream.format("memory").queryName("trend_out").outputMode("append").start()
    try {
      val all = evs(1, 14) ++ evs(2, 9)
      input.addData(all.filter(_.ts_us < 5000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 5000000): _*)
      q.processAllAvailable()
      def optL(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), optL(r, 3), optL(r, 4), optL(r, 5))
      val streamed = spark.table("trend_out")
        .select("user_id", "ts_us", "trend_n", "slope_s4", "intercept_s4", "r2_s4")
        .collect().map(key).toSet
      val s4c = (c: String) => floor(col(c) * 10000d + 0.5d).as(c + "_s4")
      val batch = graft.ts.TimeOps.expandingTrend(
          all.map(e => (e.user_id, e.ts_us, e.value)).toDF("user_id", "ts_us", "value"),
          "value", Seq("user_id"), Seq("ts_us"))
        .select(col("user_id"), col("ts_us"), col("trend_n"),
          s4c("slope"), s4c("intercept"), s4c("r2"))
        .collect().map(key).toSet
      assert(streamed == batch, "streaming trend must be bit-identical to the batch scan")
      assert(streamed.exists(_._4.isEmpty), "first row per key has no fit")
    } finally q.stop()
  }

  test("streamingBrown equals the batch Brown smoothing across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.streamingBrown(input.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("brown_out").outputMode("append").start()
    try {
      val all = evs(1, 14) ++ evs(2, 9)
      input.addData(all.filter(_.ts_us < 5000000): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.ts_us >= 5000000): _*)
      q.processAllAvailable()
      val cols = Seq("user_id", "ts_us", "ewma1", "ewma2", "level", "trend", "forecast1")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val streamed = spark.table("brown_out").select(cols.head, cols.tail: _*)
        .collect().map(key).toSet
      val batch = graft.ts.TimeOps.brownSmoothing(
          all.map(e => (e.user_id, e.ts_us, e.value)).toDF("user_id", "ts_us", "value"),
          "value", Seq("user_id"), Seq("ts_us"), alpha = 0.2)
        .select(cols.head, cols.tail: _*)
        .collect().map(key).toSet
      assert(streamed == batch, "streaming Brown smoothing must be bit-identical to the batch scan")
    } finally q.stop()
  }

  private def optRow(r: org.apache.spark.sql.Row, from: Int): Seq[Option[Double]] =
    (from until r.length).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))

  test("streamingTaylor is bit-identical to batch trailing taylor (plain and ew-edge specs)") {
    val all = evs(1, 20) ++ evs(2, 9)
    for (spec <- Seq(
      graft.ts.TaylorBasis.Spec("value", 2, 5, "trailing", None, fillEdges = false),
      graft.ts.TaylorBasis.Spec("value", 1, 5, "trailing", Some(3), fillEdges = true))) {
      val streamed = StreamRunner.run(spark, all, nChunks = 3, "append")(ds =>
          StreamingFeaturize.streamingTaylor(ds, spec))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> optRow(r, 3)).toMap
      val batch = graft.ts.Taylor.windowedTaylorCoefs(
          all.toDF("user_id", "ts_us", "value"), Seq("value"), Seq("user_id"), Seq("ts_us"),
          spec.degree, Seq(spec.windowSize), Seq("trailing"), Seq(spec.ewSpan), spec.fillEdges)
        .df.select(col("user_id") +: col("ts_us") +: col("value") +:
          (0 to spec.degree).map(d => col(spec.featName(d))): _*)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> optRow(r, 3)).toMap
      assert(streamed == batch, s"spec $spec diverged")
    }
  }

  test("streamingDomfreq equals batch trailing domfreq on full-window rows, null before") {
    val w = 6
    val all = evs(1, 20) ++ evs(2, 8)
    val streamed = StreamRunner.run(spark, all, nChunks = 3, "append")(ds =>
        StreamingFeaturize.streamingDomfreq(ds, w = w, nDomfreq = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> optRow(r, 3)).toMap
    val batch = graft.ts.DomFreq.domfreq(
        all.toDF("user_id", "ts_us", "value"), Seq("value"), Seq("user_id"), Seq("ts_us"),
        Seq(w), Seq("trailing"), nDomfreq = 2)
      .df.collect().map(r => (r.getLong(0), r.getLong(1)) -> optRow(r, 3)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case ((u, ts), feats) =>
      val pos = ts / 1000000
      if (pos < w - 1) assert(feats.forall(_.isEmpty), s"pre-window row ($u,$ts) must be null")
      else assert(feats == batch((u, ts)), s"row ($u,$ts) diverged from batch")
    }
  }

  test("streamingJsonRollup + batch fold equals Profile.jsonPropsRollup across micro-batches") {
    val rows = Seq(
      JsonEv("click", """{"k": 3}""", 1L, 1.01),
      JsonEv("click", """{"k": 7}""", 1L, 2.0),
      JsonEv("click", """{"k": 12}""", 2L, 0.5),
      JsonEv("view", """{"k": 99}""", 3L, 10.0),
      JsonEv("view", """{"k": 95}""", 4L, 1.0),
      JsonEv("view", """{"j": 1}""", 3L, 1.0)) // missing field → null bucket
    val perUser = StreamRunner.run(spark, rows, nChunks = 3, "complete")(ds =>
      StreamingFeaturize.streamingJsonRollup(ds, "k", bucketWidth = 10))
    val folded = perUser.groupBy("event_type", "k_bucket")
      .agg(sum("n_events").as("n_events"), sum("sum_k").as("sum_k"),
        count(lit(1)).as("n_users"), sum("sum_value_cents").as("sum_value_cents"))
      .orderBy("event_type", "k_bucket")
      .collect().map(_.toSeq).toSeq
    val batch = graft.functions.Profile.jsonPropsRollup(
        rows.toDF("event_type", "props", "user_id", "value"),
        "event_type", "props", "k", "user_id", "value", bucketWidth = 10)
      .collect().map(_.toSeq).toSeq
    assert(folded == batch, s"stream $folded != batch $batch")
  }

  test("watermarked session rollups match the batch sess_agg shape") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.sessionAgg(input.toDF(), "ts_us", "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("complete").start()
    try {
      // two sessions for user 1 (gap > 30 min), one for user 2
      val all = Seq(
        Ev(1, 0L, 1.0), Ev(1, 60L * 1000000, 2.0), Ev(1, 120L * 1000000, 3.0),
        Ev(1, 10000L * 1000000, 4.0), Ev(1, 10060L * 1000000, 5.0),
        Ev(2, 0L, 7.0))
      input.addData(all: _*)
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .select("user_id", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sessions == Set((1L, 3L, 6.0), (1L, 2L, 9.0), (2L, 1L, 7.0)))
      // session bounds: batch sessionize agrees on membership
      val batch = graft.ts.TimeOps.sessionize(
          all.toDF("user_id", "ts_us", "value"), Seq("user_id"), Seq("ts_us"), "ts_us",
          gapMicros = 1800000000L)
        .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .select("user_id", "n", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch == sessions)
    } finally q.stop()
  }

  test("watermarked tumbling agg matches batch buckets after stream completion") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingFeaturize.tumblingAgg(input.toDF(), "ts_us", "1 hour", "1 day")
      .writeStream.format("memory").queryName("tumble_out").outputMode("complete").start()
    try {
      val all = (0 until 50).map(i => Ev(1, i.toLong * 3600L * 1000000, i.toDouble))
      input.addData(all: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumble_out")
        .select("day_us", "user_id", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = all.toDF("user_id", "ts_us", "value")
        .groupBy((col("ts_us") - col("ts_us") % 86400000000L).as("day_us"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
