package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Bounded-memory heavy-hitter machinery — the 100 TB path for
  * top-terms (SURVEY §7 headroom: `text_topterms`' explode+count is an
  * exact full shuffle of the vocabulary; at corpus scale the vocabulary
  * itself is the problem).
  *
  * Design: per-partition Misra-Gries summaries propose a SMALL
  * candidate superset (≤ capacity terms per partition, merged on the
  * driver side of a broadcast — never the full vocabulary), then ONE
  * exact recount pass restricted to the broadcast candidates yields
  * EXACT counts for the survivors. This BATCHED variant (decrement all
  * by the min and re-admit the incoming term at count 1 — each eviction
  * event removes ~min·capacity mass for one arriving token) guarantees
  * any term with partition-local count > ~N_p/capacity survives its
  * partition's summary — a slightly weaker bound than classic
  * one-at-a-time Misra-Gries' N_p/(capacity+1). So every global heavy
  * hitter with frequency above ~1/capacity of its densest partition is
  * a candidate — with
  * capacity ≫ k the exact global top-k is recovered exactly (the
  * MisraGriesSpec pins this on a zipf corpus where capacity < distinct
  * terms, i.e. the summary genuinely evicts).
  *
  * Scale shape: pass 1 is a map-only scan emitting ≤ capacity rows per
  * partition (no vocabulary shuffle — the only exchange is over the
  * tiny survivor set); pass 2 is a broadcast-semi-joined recount whose
  * groupBy key domain is ≤ capacity·partitions. Memory is O(capacity)
  * per task. Compare: the exact path shuffles every distinct term.
  */
object Sketch {

  /** Per-partition Misra-Gries survivors of a single string column.
    * Returns the distinct surviving terms (one row per term per
    * partition, pre-distinct). Decrement is batched: when the summary
    * overflows, the minimum count is subtracted from every entry and
    * zeros are evicted — amortized O(1) per token.
    */
  def misraGriesCandidates(terms: DataFrame, termCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val idx = terms.schema.fieldIndex(termCol)
    val schema = StructType(Seq(StructField("term", StringType, nullable = false)))
    terms.mapPartitions { iter =>
      val counts = new java.util.HashMap[String, Long](capacity * 2)
      iter.foreach { row =>
        if (!row.isNullAt(idx)) {
          val t = row.getString(idx)
          val cur = counts.getOrDefault(t, 0L)
          if (cur > 0L) counts.put(t, cur + 1L)
          else if (counts.size < capacity) counts.put(t, 1L)
          else {
            // batched decrement-by-min, evicting zeroed entries
            var min = Long.MaxValue
            val it0 = counts.values().iterator()
            while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
            val it1 = counts.entrySet().iterator()
            while (it1.hasNext) {
              val e = it1.next()
              val nv = e.getValue - min
              if (nv <= 0L) it1.remove() else e.setValue(nv)
            }
            // the incoming term absorbs the same decrement: only
            // admitted if the summary now has room (min-count entries
            // always leave at least one slot)
            if (counts.size < capacity) counts.put(t, 1L)
          }
        }
      }
      val out = new Array[Row](counts.size)
      var i = 0
      val it = counts.keySet().iterator()
      while (it.hasNext) { out(i) = Row(it.next()); i += 1 }
      out.iterator
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Exact top-k terms via the MG-candidates + recount pattern. The
    * result equals the full-shuffle exact top-k whenever the k-th
    * term's count clears the Misra-Gries survival bound — which the
    * caller controls via `capacity` (error ≤ N_partition/(capacity+1)).
    * Ties break on the term string, like `text_topterms`.
    */
  def topTermsSketched(
      docs: DataFrame,
      textCol: String,
      k: Int,
      capacity: Int): DataFrame = {
    val terms = docs.select(explode(TextOps.tokens(col(textCol))).as("term"))
    val cands = misraGriesCandidates(terms, "term", capacity).distinct()
    terms.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
  }
}
