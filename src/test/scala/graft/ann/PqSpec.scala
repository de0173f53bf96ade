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

  test("L2 nearest-centroid kernel breaks ties toward the lowest code") {
    val v = Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v")
    val cents = Seq(Array(0.0, 0.0), Array(2.0, 2.0)) // equidistant from (1,1)
    val code = v.select(graft.plans.HashExpressions.nearestCentroidL2(col("v"), cents).as("c"))
      .head().getInt(0)
    assert(code == 0)
  }
}
