package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch featurize/TimeOps operators
  * (SURVEY.md §streaming). Same column names and NULL semantics as the
  * batch ops, so a pipeline can be developed in batch and deployed on a
  * stream unchanged.
  */
case class Ev(user_id: Long, ts_us: Long, value: Double)
case class Doc(doc_id: Long, text: String)
case class DedupVerdict(doc_id: Long, dup_of: Option[Long])
case class SeenDoc(first_id: Long)
case class RollFeat(
    user_id: Long,
    ts_us: Long,
    value: Double,
    value_lag1: Option[Double],
    value_rollmean: Option[Double])
/** Top-level on purpose: object-nested state classes produce
  * `Outer$Inner` names the encoder's generated Java fails to resolve.
  */
case class RingState(ring: Array[Double])
case class EwmaState(num: Double, den: Double)
case class BandMin(min_id: Long)

object StreamingFeaturize {

  /** Per-key streaming lag/rollmean via flatMapGroupsWithState: state is
    * a (w-1)-deep ring buffer per key — O(w) memory per key, unbounded
    * stream. Events are processed in event-time order WITHIN each
    * micro-batch; cross-batch late data is the watermarking layer's job
    * (pair with withWatermark upstream).
    *
    * Emits the batch operators' exact semantics: `value_lag1` null for
    * the first event of a key, `value_rollmean` null until a full
    * window of w values exists (minPeriods = w).
    */
  def rollingFeatures(events: Dataset[Ev], w: Int): Dataset[RollFeat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, evs: Iterator[Ev], state: GroupState[RingState]) => {
          var ring: Vector[Double] = state.getOption.map(_.ring.toVector).getOrElse(Vector.empty)
          val out = evs.toSeq.sortBy(e => (e.ts_us, e.value)).map { e =>
            val lag1 = ring.lastOption
            val withCur = (ring :+ e.value).takeRight(w)
            // newest-first summation: bit-identical to the batch
            // rollmean's (current + lag1 + lag2 + …) fold order
            val mean = if (withCur.size >= w) Some(withCur.reverseIterator.sum / w) else None
            ring = withCur.takeRight(w - 1)
            RollFeat(key, e.ts_us, e.value, lag1, mean)
          }
          state.update(RingState(ring.toArray))
          out.iterator
        })
  }

  /** Streaming exact dedup: the batch Dedup.exact twin for a document
    * stream. State per normalized-text key = the first doc_id seen;
    * later arrivals emit `dup_of = first`. The grouping key is the
    * 60-bit content hash, NOT the text — state stays tiny and the
    * shuffle carries (hash, id) only, same discipline as the batch
    * path. (Hash collisions at 2^-60: acceptable for dedup; key by the
    * normalized text itself if not.)
    */
  def streamingExactDedup(docs: Dataset[Doc]): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    val hashed = docs
      .withColumn("__k", graft.functions.TextOps.h60(graft.functions.TextOps.normalize(col("text"))))
      .select(col("doc_id"), col("__k")).as[(Long, Long)]
    hashed
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long)], state: GroupState[SeenDoc]) => {
          val ids = rows.map(_._1).toSeq.sorted
          var first = state.getOption.map(_.first_id)
          val out = ids.map { id =>
            first match {
              case None =>
                first = Some(id)
                DedupVerdict(id, None)
              case Some(f) => DedupVerdict(id, Some(f))
            }
          }
          state.update(SeenDoc(first.get))
          out.iterator
        })
  }

  /** Streaming MinHash near-dup: the batch minhashDupOf twin for a
    * document stream. The batch signature/banding Column expressions
    * run unchanged on the stream; state per (band_idx, band_key)
    * bucket = the minimum doc_id seen (one long — the same anchored
    * bucket-min discipline as the batch path), and the per-doc verdict
    * aggregates the doc's band candidates (emitted together in its
    * arrival micro-batch). First-seen wins: a doc's verdict reflects
    * docs that arrived before it, which equals the batch verdict when
    * arrival order follows id order (spec-pinned).
    */
  def streamingMinhashDedup(
      docs: Dataset[Doc],
      shingleSize: Int = 3,
      k: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    val sig = graft.dedup.Dedup.minhashSignatures(
      docs.toDF(), "doc_id", "text", shingleSize, graft.functions.TextOps.minhashParams(k))
    val bands = graft.dedup.Dedup.lshBands(sig, "doc_id", k, rowsPerBand)
      .as[(Long, Int, String)]
    val candidates = bands
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[(Long, Int, String)], state: GroupState[BandMin]) => {
          val ids = rows.map(_._1).toSeq.sorted
          var mn = state.getOption.map(_.min_id)
          val out = ids.map { id =>
            val cand = mn.filter(_ < id)
            if (mn.forall(id < _)) mn = Some(id)
            (id, cand)
          }
          state.update(BandMin(mn.get))
          out.iterator
        })
      .toDF("doc_id", "cand")
    candidates.groupBy("doc_id").agg(min("cand").as("dup_of"))
  }

  /** Watermarked tumbling aggregation: the streaming twin of the batch
    * ts_tumbling query (same 1-day buckets, count + sum).
    */
  def tumblingAgg(events: DataFrame, tsCol: String, watermark: String, windowLen: String): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsCol)))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(unix_micros(col("window.start")).as("day_us"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Watermarked session rollups via `session_window`: the streaming
    * twin of the batch sess_agg query (sessionize + per-session
    * count/sum). Sessions close when the gap exceeds `gap`; emission
    * waits for the watermark, exactly Structured Streaming's
    * session-window contract.
    */
  def sessionAgg(events: DataFrame, tsCol: String, watermark: String, gap: String): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsCol)))
      .withWatermark("__ts", watermark)
      .groupBy(session_window(col("__ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact recursive EWMA (pandas ewm adjust=true), the
    * TimeOps.ewma twin: state per key = the two running scalars
    * (num, den) — O(1) memory per key on an unbounded stream, same
    * recurrence and therefore bit-identical values to the batch scan
    * for in-order input (cross-batch late data is the watermark
    * layer's job).
    */
  def streamingEwma(events: Dataset[Ev], alpha: Double): Dataset[RollFeat] = {
    import events.sparkSession.implicits._
    val beta = 1.0 - alpha
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, evs: Iterator[Ev], state: GroupState[EwmaState]) => {
          var (num, den) = state.getOption.map(s => (s.num, s.den)).getOrElse((0.0, 0.0))
          val out = evs.toSeq.sortBy(e => (e.ts_us, e.value)).map { e =>
            num = beta * num + e.value
            den = beta * den + 1.0
            RollFeat(key, e.ts_us, e.value, None, Some(num / den))
          }
          state.update(EwmaState(num, den))
          out.iterator
        })
  }
}
