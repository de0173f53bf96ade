package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateClusters closes transitive chains into one family") {
    // A ≈ B (share most shingles), B ≈ C, but A and C share fewer —
    // a chain that per-bucket anchoring cannot fully merge. Long docs
    // with single-word edits keep per-band collision odds high; the
    // minhash params are fixed, so the outcome is deterministic.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = base.replace("w5 ", "x5 ")
    val c = b.replace("w25 ", "x25 ")
    val docs = Seq(
      (0L, base), (1L, b), (2L, c),
      (10L, "completely unrelated content about spark query engines and columnar execution plans"),
      (11L, "completely unrelated content about spark query engines and columnar execution plans"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L && out(1L) == 0L,
      s"near-dup chain head must label to the minimum: $out")
    assert(out(2L) == out(1L), s"transitive member must join the family: $out")
    assert(out(10L) == 10L && out(11L) == 10L, s"exact dups cluster; unrelated stay apart: $out")
  }

  test("star contraction: 64-link chain converges in O(log n) rounds, exact labels") {
    // a worst-case high-diameter component: plain min-label propagation
    // needs ~64 rounds here; alternating large/small-star halves tree
    // heights each round. Mixed edge orientation exercises the
    // canonicalization.
    val n = 64
    val edges = (0 until n)
      .map(i => if (i % 2 == 0) (i.toLong, (i + 1).toLong) else ((i + 1).toLong, i.toLong))
      .toDF("src", "dst")
    val (labels, rounds, converged) = Dedup.connectedComponentsStar(edges, maxIters = 20)
    assert(converged, "chain must converge inside maxIters")
    val labs = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to n).foreach(i => assert(labs(i.toLong) == 0L, s"node $i must label to 0, got ${labs.get(i.toLong)}"))
    assert(rounds <= 8, s"expected O(log n) contraction rounds on a 65-node chain, got $rounds")
  }

  test("star contraction: checkpoint cadence 1 and 3 produce identical labels") {
    // the cadence is a materialization/plan-depth trade, never a
    // semantics knob: every-round (1), default (2, above), and sparse
    // (3) checkpointing must agree exactly on labels. Round counts MAY
    // differ: convergence is detected checkpoint-to-checkpoint, so a
    // sparser cadence can run up to 2k-2 extra idempotent passes after
    // the frame stabilizes (bounded below).
    val n = 64
    val edges = (0 until n)
      .map(i => if (i % 2 == 0) (i.toLong, (i + 1).toLong) else ((i + 1).toLong, i.toLong))
      .toDF("src", "dst")
    def run(k: Int) = {
      val (labels, rounds, converged) = Dedup.connectedComponentsStar(edges, maxIters = 20, checkpointEvery = k)
      assert(converged, s"cadence $k must converge")
      (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }
    val (labs1, r1) = run(1)
    val (labs3, r3) = run(3)
    assert(labs1 == labs3, "cadence must not change labels")
    assert(r3 >= r1 && r3 - r1 <= 4,
      s"cadence 3 may overshoot by at most 2k-2 = 4 idempotent passes: $r1 vs $r3")
    (1 to n).foreach(i => assert(labs1(i.toLong) == 0L))
  }

  test("star contraction: disjoint components keep separate minimum labels") {
    val edges = Seq(
      (5L, 3L), (3L, 9L),          // component {3, 5, 9} → 3
      (20L, 21L), (22L, 21L),      // component {20, 21, 22} → 20
      (40L, 41L))                  // component {40, 41} → 40
      .toDF("src", "dst")
    val (labels, _, converged) = Dedup.connectedComponentsStar(edges, maxIters = 20)
    assert(converged)
    val labs = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs(5L) == 3L && labs(9L) == 3L)
    assert(labs(21L) == 20L && labs(22L) == 20L)
    assert(labs(41L) == 40L)
    assert(!labs.contains(3L) && !labs.contains(20L) && !labs.contains(40L),
      "roots appear only as labels; the final left join maps them to themselves")
  }

  test("duplicateClusters labels singletons with their own id") {
    val docs = (0 until 8)
      .map(i => (i.toLong, s"unique document $i " + ("filler" + i + " ") * 10))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, lab) => assert(id == lab, s"singleton $id labeled $lab") }
  }

  test("purgeStats: keeps exactly the family representatives with correct family sizes") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base), (2L, base), // one family of 3
      (7L, "totally standalone document about columnar shuffles and codegen spans today"))
      .toDF("doc_id", "text")
    val out = Dedup.purgeStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(0L) == ((0L, 3L, true)), s"rep keeps: ${out(0L)}")
    assert(out(1L) == ((0L, 3L, false)) && out(2L) == ((0L, 3L, false)), "members drop")
    assert(out(7L) == ((7L, 1L, true)), "singleton keeps itself")
    // purge verdict is consistent: one kept doc per family
    val families = out.values.groupBy(_._1)
    families.foreach { case (fam, rows) =>
      assert(rows.count(_._3) == 1, s"family $fam must keep exactly one doc")
    }
  }

  test("purgeStats: family sizes come from a partial-agg groupBy, not a window") {
    val docs = Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = Dedup.purgeStats(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("partial_count(1)"),
      s"family size must partial-aggregate before its exchange:\n${plan.take(1500)}")
  }

  test("purgeBestQuality: the representative is the best-quality member, ties to lowest id") {
    import graft.functions.TextOps
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // doc 1 is a single-word near-dup of 0 where the edit swaps in a
    // stopword — same banding behavior as the chain test, but a
    // strictly different quality score
    val docs = Seq(
      (0L, base), (1L, base.replace("w5 ", "the ")), (2L, base),
      (7L, "totally standalone document about columnar shuffles and codegen spans today"))
      .toDF("doc_id", "text")
    val q4 = docs.select(col("doc_id"),
      floor(TextOps.qualityScore(col("text")) * 10000d + 0.5d).cast("long").as("q4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q4(1L) != q4(0L), "the stopword edit must move the quality score")
    val out = Dedup.purgeBestQuality(docs, "doc_id", "text")
      .select("doc_id", "cluster_id", "family_size", "q4", "rep_id", "kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // q4 column carries the same score the pick used
    out.foreach { case (id, _, _, q, _, _) => assert(q == q4(id)) }
    // docs 0/1/2 must band into one family (single-word edit)
    val famOf = out.map(r => r._1 -> r._2).toMap
    assert(famOf(0L) == 0L && famOf(1L) == 0L && famOf(2L) == 0L, s"family: $famOf")
    // the representative of EVERY family is its (q4 desc, id asc) argmax
    out.groupBy(_._2).foreach { case (fam, rows) =>
      val expectRep = rows.minBy(r => (-r._4, r._1))._1
      rows.foreach { case (id, _, size, _, rep, kept) =>
        assert(rep == expectRep, s"family $fam rep $rep != expected $expectRep")
        assert(kept == (id == expectRep))
        assert(size == rows.size)
      }
    }
  }

  test("purgeBestQuality: representative pick is a partial-agg min_by, not a family window") {
    val docs = Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = Dedup.purgeBestQuality(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("partial_min_by("),
      s"rep pick must partial-aggregate before its exchange:\n${plan.take(1500)}")
  }
}
