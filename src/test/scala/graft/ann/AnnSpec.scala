package graft.ann

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import scala.util.Random

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // clustered corpus: 4 well-separated centers + noise
  private lazy val corpus = {
    val rnd = new Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zipWithIndex.map { case (v, d) => (v + rnd.nextGaussian() * 0.3).toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("bruteTopK: exact, rank-1 neighbor of a vector is itself") {
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 5)
    val r1 = top.where($"rank" === 1).select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 0L, 1L -> 1L))
    // all rank-(<=5) neighbors of query 0 are in its cluster (ids ≡ 0 mod 4)
    val n0 = top.where($"qid" === 0).select("vec_id").as[Long].collect()
    assert(n0.forall(_ % 4 == 0), n0.mkString(","))
  }

  test("top-k plans keep Spark's rank-limit pushdown (WindowGroupLimit before the exchange)") {
    // a refactor that breaks the row_number-rank-filter shape (e.g. a
    // filter on a derived column Spark can't see through) would silently
    // lose the partial top-k and ship every scored row through the
    // exchange — pin the operator's presence in all three search paths
    val planes = VectorOps.lshPlanes(6, 16, seed = 3L)
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val plans = Map(
      "ann_topk" -> Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 5),
      "ann_lsh_topk" -> Ann.lshTopK(corpus, q, "vec_id", "embedding", "qid", k = 5, planes),
      "ann_pq_adc" -> Ann.pqTopK(Ann.pqCodes(corpus, "vec_id", "embedding", books),
        q, "vec_id", "embedding", "qid", k = 5, books))
    for ((name, df) <- plans) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost the WindowGroupLimit rank pushdown:\n${plan.take(1500)}")
    }
  }

  test("lshTopK: bucket-restricted search finds the same top-1 on clustered data") {
    val planes = VectorOps.lshPlanes(6, 16, seed = 3L)
    val q = corpus.where($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding")
    val brute = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    val lsh = Ann.lshTopK(corpus, q, "vec_id", "embedding", "qid", k = 1, planes)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    // the query itself always shares its own bucket → top-1 is exact
    assert(lsh == brute)
  }

  test("lshTopKMultiProbe: hamming-1 probing recalls at least the single-bucket result set") {
    val planes = VectorOps.lshPlanes(6, 16, seed = 3L)
    val q = corpus.where($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding")
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val single = hits(Ann.lshTopK(corpus, q, "vec_id", "embedding", "qid", k = 10, planes))
    val multi = hits(Ann.lshTopKMultiProbe(corpus, q, "vec_id", "embedding", "qid", k = 10, planes))
    val brute = hits(Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 10))
    // multiprobe recall >= single-bucket recall, both bounded by brute
    assert((multi intersect brute).size >= (single intersect brute).size)
    assert((multi intersect brute).size > 0)
  }

  test("ivfTopK: probing enough cells recovers the brute-force top-1") {
    val q = corpus.where($"vec_id" >= 100 && $"vec_id" < 104)
      .select($"vec_id".as("qid"), $"embedding")
    val brute = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    val ivf = Ann.ivfTopK(corpus, q, "vec_id", "embedding", "qid", k = 1, nCentroids = 8, nprobe = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("ivfAssign groups cluster members into the same cell") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", 8)
    val cells = Ann.ivfAssign(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    // ids ≡ j (mod 4) share a cluster. With 8 seed centroids over 4
    // clusters, two seeds can split one cluster, so agreement is well
    // below 100% — but must be far above the ~12% random baseline.
    val agree = (0 until 196).count(i => cells(i.toLong) == cells((i + 4).toLong))
    assert(agree > 90, s"same-cluster cell agreement too low: $agree/196")
  }

  test("LshBucketKernel equals the declarative plane-dot bucket bit-for-bit") {
    val planes = VectorOps.lshPlanes(8, 16, seed = 21L)
    val both = corpus.select($"vec_id",
      VectorOps.lshBucket($"embedding", planes).as("k"),
      VectorOps.lshBucketDeclarative($"embedding", planes).as("d"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"vec ${r.getLong(0)}"))
  }

  test("ivfAssign kernel is value-identical to the cross-join+min_by spec form") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", 8)
    val kernel = Ann.ivfAssign(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val shuffled = Ann.ivfAssignShuffled(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(kernel == shuffled)
    val cellsOnly = Ann.ivfAssignCells(corpus, "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toMap
    assert(cellsOnly == kernel)
  }

  test("ivfAssign plan is a map-only scan: zero exchanges before any consumer agg") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", 8)
    val plan = Ann.ivfAssignCells(corpus, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("LshBucketKernel buckets a NULL vector to 0, matching the declarative form") {
    val planes = VectorOps.lshPlanes(4, 2, seed = 9L)
    val df = Seq(
      (1L, None: Option[Seq[Float]]),
      (2L, Some(Seq(1.0f, -2.0f)))
    ).toDF("vec_id", "embedding")
    val both = df.select(
      VectorOps.lshBucket($"embedding", planes).as("k"),
      VectorOps.lshBucketDeclarative($"embedding", planes).as("d")).collect()
    both.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getLong(0) == r.getLong(1))
    }
    assert(both(0).getLong(0) == 0L)
  }

  test("lsh buckets put near-identical vectors together") {
    val planes = VectorOps.lshPlanes(8, 16, seed = 5L)
    val b = Ann.buckets(corpus, "vec_id", "embedding", planes)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    // same-cluster vectors should collide far more than cross-cluster
    val sameCluster = (0 until 196 by 4).count(i => b(i.toLong) == b((i + 4).toLong))
    val crossCluster = (0 until 196 by 4).count(i => b(i.toLong) == b((i + 1).toLong))
    assert(sameCluster > crossCluster * 2, s"same=$sameCluster cross=$crossCluster")
  }
}
