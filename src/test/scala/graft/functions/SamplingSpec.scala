package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("sampleByHash is deterministic, order-independent, and ≈fraction sized") {
    val a = Sampling.sampleByHash(ids, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids.repartition(7).orderBy(rand(1)), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "per-row fate must not depend on layout")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"got ${a.size}/2000")
  }

  test("split partitions every row exactly once with ≈requested fractions") {
    val s = Sampling.split(ids, "id", 0.7, 0.15)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") / 2000.0 - 0.70) < 0.05, counts.toString)
    assert(math.abs(counts("valid") / 2000.0 - 0.15) < 0.03, counts.toString)
    // sample then split compose: the split of a sample keeps the fate
    // of shared rows (both are functions of the same hash)
    val sampled = Sampling.split(Sampling.sampleByHash(ids, "id", 0.8), "id", 0.7, 0.15)
    val full = s.select("id", "split").as[(Long, String)].collect().toMap
    sampled.select("id", "split").as[(Long, String)].collect().foreach { case (id, sp) =>
      assert(full(id) == sp)
    }
  }

  test("sampling plans a map-only scan: no exchange") {
    val plan = Sampling.sampleByHash(ids, "id", 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("stratifiedSample draws exactly n per stratum, layout-independent") {
    val strat = ids.withColumn("g", (col("id") % 4).cast("string"))
    val a = Sampling.stratifiedSample(strat, "g", "id", n = 10)
      .select("g", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    assert(a.size == 40, s"4 strata × 10, got ${a.size}")
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    val b = Sampling.stratifiedSample(strat.repartition(7).orderBy(rand(3)), "g", "id", n = 10)
      .select("g", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    assert(a == b, "the drawn set (and ranks) must not depend on layout")
  }

  test("stratifiedSample keeps the rank-limit pushdown (WindowGroupLimit)") {
    val strat = ids.withColumn("g", (col("id") % 4).cast("string"))
    val plan = Sampling.stratifiedSample(strat, "g", "id", n = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"lost WindowGroupLimit:\n${plan.take(1200)}")
  }

  test("shardAssign: every row placed once, positions contiguous from 0, layout-independent") {
    val out = Sampling.shardAssign(ids, "id", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 2000 && out.map(_._1).distinct.length == 2000)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 0L && ps.last == ps.length - 1L && ps.distinct.length == ps.length,
        s"shard $shard positions not contiguous from 0")
    }
    // layout independence: same placement from a shuffled frame
    val out2 = Sampling.shardAssign(ids.repartition(13).orderBy(rand(7)), "id", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out2 == out.toSet, "shard/pos must be a pure function of the key")
  }

  test("mixtureSample: per-domain keep rates are exact bucket cutoffs") {
    val docs = ids.withColumn("dom",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val kept = Sampling.mixtureSample(docs, "id", col("dom"),
        weights = Map("a" -> 1.0, "b" -> 0.0), defaultFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom.getOrElse("a", 0) == 667, s"weight 1.0 keeps all of domain a: $byDom")
    assert(!byDom.contains("b"), s"weight 0.0 drops all of domain b: $byDom")
    val c = byDom.getOrElse("c", 0)
    assert(math.abs(c / 666.0 - 0.5) < 0.07, s"default 0.5 on domain c: $c/666")
    // exact per-row agreement with the bucket rule
    kept.foreach { case (id, dom) =>
      assert(dom != "b")
    }
  }

  test("shardAssign plans ONE exchange, keyed on the shard") {
    val plan = Sampling.shardAssign(ids, "id", shards = 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange:\n${plan.take(1200)}")
    assert(plan.contains("hashpartitioning(shard"),
      s"the exchange must key on the shard:\n${plan.take(1200)}")
  }

  test("mixtureSample stays a map-only scan (no exchange)") {
    val docs = ids.withColumn("dom", (col("id") % 2).cast("string"))
    val plan = Sampling.mixtureSample(docs, "id", col("dom"), Map("0" -> 0.5), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture sampling must not shuffle:\n${plan.take(1000)}")
  }

  test("qualityBuckets: tercile labels are ordered, per-language, ~third-sized") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val docs = (0L until 300L).map { i =>
      val lang = if (i % 3 == 0) "en" else "es"
      // vary quality via token length / stopword mix
      val text = (if (rnd.nextInt(3) == 0) "the of and is " else "zqx ") * (3 + rnd.nextInt(20))
      (i, text, lang)
    }.toDF("doc_id", "text", "lang")
    val out = Sampling.qualityBuckets(docs, "doc_id", "text", "lang")
      .select("lang", "q4", "t1_q4", "t2_q4", "bucket")
      .as[(String, Long, Long, Long, String)].collect()
    assert(out.length == 300)
    out.foreach { case (_, q4, t1, t2, b) =>
      assert(t1 <= t2)
      val expect = if (q4 <= t1) "tail" else if (q4 <= t2) "middle" else "head"
      assert(b == expect)
    }
    // boundaries are per-language constants
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(r => (r._3, r._4)).distinct.size == 1
    })
    // the tail is never empty: t1 = floor(tercile) >= min score, so
    // min-score docs always land there (head CAN be empty under heavy
    // ties — q4 <= t2 absorbs a tied top cluster — which is correct)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.exists(_._5 == "tail"))
    }
  }

  test("qualityBuckets: boundaries ride a broadcast join, not a lang window") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "en"), (2L, "d e f", "en")).toDF("doc_id", "text", "lang")
    val plan = Sampling.qualityBuckets(docs, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no lang-partitioned window:\n${plan.take(1000)}")
    assert(plan.contains("BroadcastHashJoin"), s"boundaries must broadcast:\n${plan.take(1000)}")
  }

  test("importanceSample: keep verdict is exactly bucket < weight, map-only") {
    import spark.implicits._
    val weighted = ids.withColumn("w", (col("id") % 10001L))
    val kept = Sampling.importanceSample(weighted, "id", col("w"))
      .select("id", "w").as[(Long, Long)].collect().toMap
    val buckets = ids.select(col("id"), Sampling.hashBucket(col("id"), 10000).as("b"))
      .as[(Long, Long)].collect().toMap
    (0L until 2000L).foreach { id =>
      assert(kept.contains(id) == (buckets(id) < id % 10001L))
    }
    val plan = Sampling.importanceSample(weighted, "id", col("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"importance sampling must not shuffle:\n${plan.take(800)}")
  }

  test("temperatureSample: tail languages survive whole, head thins by exactly floor(scale/√N · buckets)") {
    import spark.implicits._
    val docs = ((1L to 40L).map(i => (i, "head")) :+ (100L, "tail"))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureSample(docs, "doc_id", col("lang"), scale = 2.0)
      .select("doc_id").as[Long].collect().toSet
    // tail: keep = min(1, 2/√1) = 1 → always kept
    assert(out.contains(100L), "tail language must be fully kept")
    // head: keep = 2/√40 → cut = floor(keep·10000); the verdict must
    // equal the hash rule exactly, doc by doc
    val cut = math.floor(math.min(1.0, 2.0 / math.sqrt(40.0)) * 10000).toLong
    val buckets = docs.where(col("lang") === "head")
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id"), 10000).as("b"))
      .as[(Long, Long)].collect().toMap
    val expected = buckets.filter(_._2 < cut).keySet + 100L
    assert(out == expected, s"got ${out.toSeq.sorted}, expected ${expected.toSeq.sorted}")
  }
}
