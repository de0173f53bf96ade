package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step an LLM pretraining
  * pipeline runs after dedup/tokenization: documents are laid
  * end-to-end in a deterministic order and cut into fixed-capacity
  * context bins; a document spanning a bin boundary is SPLIT, so every
  * bin except a shard's last is filled to exactly `capacity` tokens
  * (zero padding waste — the GPT-style packing, vs. first-fit packers
  * that trade fill for document integrity).
  *
  * Scale shape: packing is per SHARD (`doc_id mod shards`), never
  * global — one hash exchange on the shard key, one window prefix-sum
  * per shard, then a narrow explode of the spanned-bin range. No
  * global sort, no driver state, and a monster document fans out into
  * ceil(n/capacity)+1 fragment rows rather than serializing anything.
  * Output rows = documents + boundary crossings ≈ corpus tokens /
  * capacity extra rows. All arithmetic is integer → exact on any
  * engine.
  *
  * (The reference has no packing surface — graft-native, like the rest
  * of the LLM-pipeline family.)
  */
object Packing {

  /** Fragment map: one row per (document, bin) fragment.
    *
    * Columns: doc_id-col, `shard`, `bin_id` (per-shard, 0-based),
    * `bin_off` (token offset of the fragment inside its bin),
    * `frag_tokens` (fragment length). Invariants (spec-pinned):
    * per-document fragment lengths sum to the document's token count;
    * fragments tile each bin `[0, capacity)` gaplessly; every bin
    * before a shard's last holds exactly `capacity` tokens.
    *
    * `orderBy` controls the within-shard concatenation order —
    * length-grouped packing (order by token count: similar-length
    * documents land in the same bins — the curriculum/bucketing knob)
    * costs nothing beyond evaluating the expressions: the exchange is
    * still the single shard-key hash partition and the sort stays
    * inside the existing per-shard window. `idCol` is ALWAYS the final
    * tiebreak, so any ordering is a deterministic total order.
    *
    * Documents with zero tokens occupy no space and emit no fragment.
    */
  def packFragments(
      docs: DataFrame,
      idCol: String,
      tokenCol: Column,
      capacity: Long,
      shards: Int,
      orderBy: Seq[Column] = Nil): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards > 0, s"shards must be positive, got $shards")
    val ordCols = orderBy.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }
    val ordNames = orderBy.indices.map(i => col(s"__ord$i"))
    val w = Window.partitionBy("shard").orderBy(ordNames :+ col(idCol): _*)
    docs
      .select(Seq(col(idCol), tokenCol.cast("long").as("n_tok"),
        pmod(col(idCol), lit(shards.toLong)).cast("int").as("shard")) ++ ordCols: _*)
      .withColumn("tok_end", sum("n_tok").over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .where(col("n_tok") > 0)
      // non-negative offsets: div truncation == floor here
      .withColumn("bin_id",
        explode(sequence(expr(s"tok_start div $capacity"),
          expr(s"(tok_end - 1) div $capacity"))))
      .select(col(idCol), col("shard"), col("bin_id"),
        (greatest(col("tok_start"), col("bin_id") * capacity)
          - col("bin_id") * capacity).as("bin_off"),
        (least(col("tok_end"), (col("bin_id") + 1) * capacity)
          - greatest(col("tok_start"), col("bin_id") * capacity)).as("frag_tokens"))
  }

  /** Global token-budget cut WITHOUT a global sort — "take the first
    * `budget` tokens of the shuffled corpus", the cap step of corpus
    * assembly. The global order is (shard, key-hash, id): shards
    * concatenate in shard order, rows within a shard in deterministic
    * hash order.
    *
    * Scale shape — the classic two-level distributed prefix sum:
    *  1. per-shard window prefix sums (one exchange on the shard key,
    *     16-byte rows);
    *  2. per-shard TOTALS (one `shards`-row aggregate) cumsum'd in a
    *     single-partition window — `shards` rows, constant work —
    *     and BROADCAST back as each shard's global offset;
    *  3. global position = shard offset + within-shard prefix, cut by
    *     `budget` with the boundary document truncated to fit.
    * No single-partition pass ever touches row-level data, so the plan
    * survives any corpus size; every quantity is an integer.
    *
    * Output: one row per kept document — global_start, kept_tokens
    * (< n_tok only for the boundary document), truncated flag.
    */
  def budgetCut(
      docs: DataFrame,
      idCol: String,
      tokenCol: Column,
      budget: Long,
      shards: Int): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val h = TextOps.h60(col(idCol).cast("string"))
    val base = docs
      .select(col(idCol), tokenCol.cast("long").as("n_tok"),
        h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
    val w = Window.partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc)
    val withEnd = base.withColumn("__end_in_shard", sum("n_tok").over(w))
    // per-shard totals → cumulative offsets: `shards` rows, so the
    // single-partition window is constant-size driver-adjacent work
    val offsets = base.groupBy("shard").agg(sum("n_tok").as("__tot"))
      .withColumn("__offset",
        coalesce(sum("__tot").over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("__offset"))
    withEnd.join(broadcast(offsets), Seq("shard"))
      .withColumn("global_start", col("__offset") + col("__end_in_shard") - col("n_tok"))
      .withColumn("kept_tokens",
        least(col("n_tok"), greatest(lit(budget) - col("global_start"), lit(0L))))
      .where(col("kept_tokens") > 0)
      .select(col(idCol), col("shard"), col("global_start"), col("kept_tokens"),
        (col("kept_tokens") < col("n_tok")).as("truncated"))
  }
}
