package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Dedup.fuzzyContamination — near-duplicate cross-corpus
  * decontamination via MinHash banding + signature agreement.
  */
class FuzzyDecontamSpec extends SparkSpec {
  import spark.implicits._

  // long enough that a one-token edit keeps Jaccard ≈ 0.93 — the
  // banding then collides deterministically under the fixed hash
  // params (LSH recall is Jaccard-driven; a short text's single edit
  // can legitimately miss every band)
  private val benchText = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
    "kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four")
  private val docs = Seq(
    (1L, benchText),                                              // exact benchmark member
    // near-dup: LAST token edited — only ONE 3-shingle changes, so
    // J = 27/29 and the banding collides (verified under the fixed
    // seed-42 hash params: 15/16 agreement, 3 colliding bands)
    (2L, benchText.replaceAll("four$", "edited")),
    (3L, "completely different content about spark query engines and shuffles at scale"),
    (4L, "short")).toDF("doc_id", "text")
  private val bench = Seq((101L, benchText)).toDF("doc_id", "text")

  test("exact member scores full agreement; near-dup flags; unrelated does not") {
    val out = Dedup.fuzzyContamination(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(5)))).toMap
    val (n1, b1, a1, f1) = out(1L)
    assert(n1 == 1L && b1 == 101L && a1 == 16L && f1, s"exact member: ${out(1L)}")
    val (n2, b2, a2, f2) = out(2L)
    assert(n2 == 1L && b2 == 101L && a2 >= 8L && f2,
      s"one-token edit must flag with high agreement: ${out(2L)}")
    assert(out(3L)._1 == 0L && !out(3L)._4, s"unrelated doc: ${out(3L)}")
    assert(!out(4L)._4, s"sub-shingle doc never flags: ${out(4L)}")
  }

  test("tie on agreement resolves to the lowest benchmark id") {
    val twoBench = Seq((300L, benchText), (200L, benchText)).toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(docs, twoBench, "doc_id", "text")
      .where(col("doc_id") === 1L).collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 200L,
      s"two identical benchmark docs -> lowest id wins: $out")
  }

  test("tie-break survives 64-bit / negative benchmark ids (packed-key regression)") {
    // ids ≥ 2^40 and negative ids broke the old arithmetic
    // `bid - agree·2^40` min_by key (overflow / mis-order); the
    // window-max + conditional-min verdict must rank by agreement
    // first for ANY int64 id. A lower-id bench doc with LOWER
    // agreement (one-token edit) must lose to an exact match at a
    // huge id, and a negative id must win a true agreement tie.
    val hugeBench = Seq(
      (-5L, benchText.replaceAll("four$", "edited")), // near, not exact
      ((1L << 45) + 7L, benchText)).toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(docs, hugeBench, "doc_id", "text")
      .where(col("doc_id") === 1L).collect().head
    assert(out.getLong(3) == 16L && out.getLong(2) == (1L << 45) + 7L,
      s"exact match at huge id must beat nearer id with lower agreement: $out")
    val negTie = Seq((-9L, benchText), (8L, benchText)).toDF("doc_id", "text")
    val out2 = Dedup.fuzzyContamination(docs, negTie, "doc_id", "text")
      .where(col("doc_id") === 1L).collect().head
    assert(out2.getLong(2) == -9L, s"agreement tie -> lowest (negative) id wins: $out2")
  }

  test("scale shape: benchmark side broadcasts, verdict partial-aggs, window only doc-keyed") {
    val plan = Dedup.fuzzyContamination(docs, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark must broadcast:\n${plan.take(1500)}")
    // the tie-break window partitions on the DOC id (diffuse key,
    // candidates per doc bounded by the band join) — never on a
    // content-derived key; exactly one such window node
    assert(plan.toLowerCase.contains("windowspecdefinition(doc_id"),
      s"tie-break window must key on doc_id:\n${plan.take(1500)}")
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      s"verdict must partial-aggregate:\n${plan.take(1500)}")
  }
}
