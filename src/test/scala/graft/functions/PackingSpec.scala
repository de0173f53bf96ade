package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of concat-and-chunk sequence packing: exact tiling of
  * every bin, per-document token conservation across splits, full fill
  * of all non-final bins, and the monster-document fan-out shape.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val C = 16L

  private def pack(docs: Seq[(Long, Long)], shards: Int = 4) =
    Packing.packFragments(
      docs.toDF("doc_id", "n"), "doc_id", col("n"), C, shards)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("fragments conserve every document's token count") {
    val rng = new scala.util.Random(3)
    val docs = (0L until 200L).map(id => id -> rng.nextInt(40).toLong)
    val frags = pack(docs)
    val byDoc = frags.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    docs.foreach { case (id, n) =>
      assert(byDoc.getOrElse(id, 0L) == n, s"doc $id: ${byDoc.get(id)} != $n")
    }
  }

  test("every bin except a shard's last is filled to exactly capacity, tiled gaplessly") {
    val rng = new scala.util.Random(9)
    val docs = (0L until 300L).map(id => id -> (1L + rng.nextInt(25)))
    val frags = pack(docs)
    frags.groupBy(f => (f._2, f._3)).foreach { case ((shard, bin), fs) =>
      // gapless tiling: sorted fragment intervals abut from 0
      val sorted = fs.sortBy(_._4)
      var at = 0L
      sorted.foreach { f =>
        assert(f._4 == at, s"shard $shard bin $bin: fragment starts at ${f._4}, expected $at")
        at += f._5
      }
      val lastBin = frags.filter(_._2 == shard).map(_._3).max
      if (bin < lastBin) assert(at == C, s"shard $shard bin $bin: fill $at != capacity $C")
      else assert(at <= C)
    }
  }

  test("a monster document fans out over ceil(n/C)+1 bins at most, in order") {
    val docs = Seq(0L -> 3L, 4L -> 100L, 8L -> 2L) // all shard 0 (shards=4)
    val frags = pack(docs).filter(_._1 == 4L).sortBy(_._3)
    assert(frags.length >= (100 / C).toInt && frags.length <= (100 / C).toInt + 2)
    assert(frags.map(_._5).sum == 100L)
    // interior fragments of the monster doc are full bins
    frags.drop(1).dropRight(1).foreach(f => assert(f._5 == C && f._4 == 0L))
  }

  test("zero-token documents emit no fragments and occupy no space") {
    val docs = Seq(0L -> 5L, 4L -> 0L, 8L -> 5L)
    val frags = pack(docs)
    assert(!frags.exists(_._1 == 4L))
    // doc 8 starts right after doc 0: offset 5 in bin 0
    val f8 = frags.filter(_._1 == 8L)
    assert(f8.length == 1 && f8.head._3 == 0L && f8.head._4 == 5L && f8.head._5 == 5L)
  }

  test("packing plans ONE hash exchange, ONE window, no join") {
    // the 100 TB shape: shard-local prefix sums + a narrow explode —
    // anything else (a join-back, a second exchange, a global sort)
    // would be a scale regression
    val docs = (0L until 100L).map(id => id -> (id % 9 + 1)).toDF("doc_id", "n")
    val plan = Packing.packFragments(docs, "doc_id", col("n"), C, 4)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    val windows = "(?m)^\\s*(?:\\+- )?Window ".r.findAllIn(plan).length
    assert(windows == 1, s"expected ONE Window op, got $windows")
    assert(!plan.contains("Join"), s"packing must not plan a join:\n${plan.take(1200)}")
    assert("Generate explode".r.findAllIn(plan).nonEmpty, "expected the spanned-bin explode")
  }

  test("curriculum order: conservation and fill invariants hold under a non-id order") {
    val rng = new scala.util.Random(17)
    val docs = (0L until 240L).map(id => id -> (1L + rng.nextInt(30)))
    val frags = Packing.packFragments(
        docs.toDF("doc_id", "n"), "doc_id", col("n"), C, shards = 4,
        orderBy = Seq(col("n")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // conservation
    val byDoc = frags.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    docs.foreach { case (id, n) => assert(byDoc.getOrElse(id, 0L) == n, s"doc $id") }
    // gapless full bins
    frags.groupBy(f => (f._2, f._3)).foreach { case ((shard, bin), fs) =>
      val sorted = fs.sortBy(_._4)
      var at = 0L
      sorted.foreach { f => assert(f._4 == at, s"shard $shard bin $bin"); at += f._5 }
      val lastBin = frags.filter(_._2 == shard).map(_._3).max
      if (bin < lastBin) assert(at == C) else assert(at <= C)
    }
    // length-grouped: within a shard, docs appear in nondecreasing
    // token-count order of their first fragment position
    frags.groupBy(_._2).foreach { case (_, fs) =>
      val firstPos = fs.groupBy(_._1).map { case (id, g) =>
        val f = g.minBy(x => (x._3, x._4))
        (id, (f._3, f._4))
      }
      val lens = docs.toMap
      val ordered = firstPos.toSeq.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq((id1, _), (id2, _)) =>
          assert(lens(id1) < lens(id2) || (lens(id1) == lens(id2) && id1 < id2),
            s"docs $id1,$id2 out of curriculum order")
        case _ => ()
      }
    }
  }

  test("budgetCut: kept tokens sum to exactly the budget, one truncated boundary doc") {
    val rng = new scala.util.Random(5)
    val docs = (0L until 300L).map(id => id -> (1L + rng.nextInt(50))).toDF("doc_id", "n")
    val all = Packing.budgetCut(docs, "doc_id", col("n"), budget = Long.MaxValue, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val corpusTokens = all.map(_._4).sum
    assert(all.forall(!_._5), "unbounded budget truncates nothing")
    val budget = corpusTokens / 2
    val cut = Packing.budgetCut(docs, "doc_id", col("n"), budget, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(cut.map(_._4).sum == budget, "kept tokens must sum to exactly the budget")
    assert(cut.count(_._5) <= 1, "at most one truncated boundary document")
    // kept set = prefix of the (shard, hash, id) global order: starts
    // tile contiguously from 0
    val sorted = cut.sortBy(_._3)
    var at = 0L
    sorted.foreach { c => assert(c._3 == at, s"doc ${c._1} starts at ${c._3}, expected $at"); at += c._4 }
  }

  test("budgetCut plans per-shard windows + a broadcast offset join, no row-level global window") {
    val docs = (0L until 100L).map(id => id -> 5L).toDF("doc_id", "n")
    val plan = Packing.budgetCut(docs, "doc_id", col("n"), budget = 100L, shards = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"shard offsets must broadcast:\n${plan.take(1500)}")
    // the row-level window partitions by shard; the only unpartitioned
    // window runs over the `shards`-row totals aggregate
    assert(plan.contains("hashpartitioning(shard"),
      s"row-level prefix sum must partition by shard:\n${plan.take(1500)}")
  }

  test("shards pack independently: fragment sets per shard depend only on that shard's docs") {
    val docs = (0L until 40L).map(id => id -> (id % 7 + 1))
    val all = pack(docs)
    val shard1Docs = docs.filter(_._1 % 4 == 1)
    val alone = Packing.packFragments(
      shard1Docs.toDF("doc_id", "n"), "doc_id", col("n"), C, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(all.filter(_._2 == 1).sortBy(f => (f._3, f._1)).toSeq ==
      alone.sortBy(f => (f._3, f._1)).toSeq)
  }
}
