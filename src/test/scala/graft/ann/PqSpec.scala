package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated cluster centers; every corpus vector is a jittered
  // copy, so its sub-vectors should code to the matching seed's codes
  private lazy val corpus = {
    val rnd = new Random(11)
    val centers = Array.fill(4)(Array.fill(32)(rnd.nextGaussian() * 5))
    (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pqCodes: clustered vectors take their cluster seed's code in every subspace") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    assert(books.length == 4 && books.forall(_.length == 4) && books.forall(_.forall(_.length == 8)))
    val codes = Ann.pqCodes(corpus, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    // seeds are vec_id 0..3 = centers 0..3, so vector i codes to (i%4)
    // in all four subspaces
    codes.foreach { case (id, cs) =>
      assert(cs.forall(_ == (id % 4).toInt), s"vec $id coded $cs")
    }
  }

  test("pqCodes plans a map-only scan: zero exchanges") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val plan = Ann.pqCodes(corpus, "vec_id", "embedding", books)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("pqTopK (ADC over codes) recovers the query's cluster members") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val codes = Ann.pqCodes(corpus, "vec_id", "embedding", books)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.pqTopK(codes, q, "vec_id", "embedding", "qid", k = 10, books)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    assert(top.length == 20)
    // every ADC hit for query q must come from q's cluster (clusters are
    // far apart, so cross-cluster ADC distances dominate)
    top.foreach { case (qid, vid) => assert(vid % 4 == qid % 4, s"q$qid hit $vid") }
  }

  test("pqTopK plans no corpus shuffle: only the final top-k exchanges") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val codes = Ann.pqCodes(corpus, "vec_id", "embedding", books)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val plan = Ann.pqTopK(codes, q, "vec_id", "embedding", "qid", k = 5, books)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected only the top-k window exchange, got $hashEx:\n${plan.take(1000)}")
  }

  test("trained codebooks: ADC top-k recalls exact-L2 top-k and beats seed codebooks") {
    // jitter is deliberately LARGE (1.5 vs the 0.05 of the seed-codebook
    // fixture): with one code per cluster every member quantizes to the
    // same ADC distance and ranking degenerates to the id tie-break, so
    // the recall signal needs k-means to subdivide clusters (m=8 fine subspaces, 32 codes
    // over 4 clusters) and capture within-cluster structure.
    val rnd = new Random(97)
    val centers = Array.fill(4)(Array.fill(32)(rnd.nextGaussian() * 5))
    val data = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 1.5).toFloat).toSeq)
    }
    val corpus = data.toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding")

    // exact squared-L2 top-10 per query, computed driver-side (120 rows)
    val vecs = data.toMap
    def exactTop(qid: Long): Set[Long] = {
      val qv = vecs(qid)
      data.map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }

    def recallOf(books: Array[Array[Array[Double]]]): Double = {
      val got = Ann.pqSearch(corpus, q, "vec_id", "embedding", "qid", k = 10,
        m = 8, nCodes = 32, codebooks = Some(books))
        .select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (0L until 4L).map(qid => (got(qid) intersect exactTop(qid)).size / 10.0).sum / 4.0
    }

    val trained = recallOf(Ann.pqTrainedCodebooks(corpus, "vec_id", "embedding", m = 8, k = 32))
    val seeded = recallOf(Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 8, k = 32))
    assert(trained >= 0.7, s"trained-codebook ADC recall@10 must be >= 0.7, got $trained")
    assert(trained >= seeded, s"training must not lose to seed slices: $trained < $seeded")
  }

  test("L2 nearest-centroid kernel breaks ties toward the lowest code") {
    val v = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
    val cents = Seq(Array(0.0, 0.0), Array(2.0, 2.0)) // equidistant from (1,1)
    val code = v.select(graft.plans.HashExpressions.nearestCentroidL2(col("v"), cents).as("c"))
      .head().getInt(0)
    assert(code == 0)
  }

  test("pqRerank: exact-cosine order and scores on everything the shortlist caught") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    // shortlist = whole corpus → rerank must equal brute-force exactly
    // (same cosine doubles, same rank order, same tie-break)
    val full = Ann.pqRerank(corpus, q, "vec_id", "embedding", "qid",
      k = 10, shortlist = 200, books)
      .select("qid", "rank", "vec_id", "cos").as[(Long, Int, Long, Double)].collect().sorted
    val brute = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 10)
      .select("qid", "rank", "vec_id", "cos").as[(Long, Int, Long, Double)].collect().sorted
    assert(full.sameElements(brute))
    // modest shortlist: results are cosine-sorted per query and come
    // from the query's own cluster (clusters far apart)
    val top = Ann.pqRerank(corpus, q, "vec_id", "embedding", "qid",
      k = 10, shortlist = 25, books)
      .select("qid", "rank", "vec_id", "cos").as[(Long, Int, Long, Double)].collect()
    assert(top.length == 20)
    top.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    top.foreach { case (qid, _, vid, _) => assert(vid % 4 == qid % 4, s"q$qid hit $vid") }
  }

  test("ivfPqTopK with nprobe = K (probe everything) equals plain ADC over all codes") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", k = 8)
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val full = Ann.ivfPqTopK(corpus, q, "vec_id", "embedding", "qid",
      k = 10, nprobe = 8, cents, books)
      .select("qid", "rank", "vec_id", "adc").as[(Long, Int, Long, Double)].collect().sorted
    val plain = Ann.pqTopK(Ann.pqCodes(corpus, "vec_id", "embedding", books),
      q, "vec_id", "embedding", "qid", k = 10, books)
      .select("qid", "rank", "vec_id", "adc").as[(Long, Int, Long, Double)].collect().sorted
    assert(full.sameElements(plain))
  }

  test("ivfPqTopK with a modest nprobe recovers the query's cluster") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", k = 8)
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.ivfPqTopK(corpus, q, "vec_id", "embedding", "qid",
      k = 10, nprobe = 2, cents, books)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    assert(top.length == 20)
    top.foreach { case (qid, vid) => assert(vid % 4 == qid % 4, s"q$qid hit $vid") }
  }

  test("ivfPqTopK plans no corpus shuffle: the index is map-only, the cell join broadcasts") {
    val cents = Ann.ivfSeedCentroids(corpus, "vec_id", "embedding", k = 8)
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val df = Ann.ivfPqTopK(corpus, q, "vec_id", "embedding", "qid",
      k = 5, nprobe = 2, cents, books)
    val plan = df.queryExecution.executedPlan.toString
    // two hash exchanges: the probe-selection window (tiny query frame)
    // and the final top-k window — the corpus index side must not shuffle
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected the two window exchanges only, got $hashEx:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("pqRerank plans no corpus shuffle: shortlist fetch is a broadcast join") {
    val books = Ann.pqSeedCodebooks(corpus, "vec_id", "embedding", m = 4, k = 4)
    val q = corpus.where($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding")
    val plan = Ann.pqRerank(corpus, q, "vec_id", "embedding", "qid",
      k = 5, shortlist = 20, books)
      .queryExecution.executedPlan.toString
    // two hash exchanges total: the stage-1 shortlist window and the
    // final rerank window — the vector fetch must NOT shuffle the corpus
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected the two top-k window exchanges only, got $hashEx:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }
}
