package graft.ann

import graft.SparkSpec
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import scala.util.Random

/** IVF with trained centroids: Spark MLlib KMeans plugs straight into
  * the same ivfAssign/ivfTopK mechanics as the seed-centroid path —
  * the quantizer is a swappable input, as documented.
  */
class KMeansIvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK with MLlib KMeans centroids recovers brute-force top-1 on clustered data") {
    val rnd = new Random(23)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 6))
    val corpus = (0 until 160).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 0.2).toFloat).toSeq)
    }.toDF("vec_id", "embedding")

    val toVec = udf((xs: Seq[Float]) => Vectors.dense(xs.map(_.toDouble).toArray))
    val model = new KMeans().setK(4).setSeed(1L).setMaxIter(10).setFeaturesCol("f")
      .fit(corpus.withColumn("f", toVec($"embedding")))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.map(_.toFloat).toSeq)
    }.toSeq.toDF("cid", "cvec")

    val assigned = Ann.ivfAssign(corpus, "vec_id", "embedding", centroids)
    // trained centroids should separate the 4 clusters almost perfectly
    val agree = assigned.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val cohesion = (0 until 156).count(i => agree(i.toLong) == agree((i + 4).toLong))
    assert(cohesion > 150, s"kmeans cells should be cohesive: $cohesion/156")

    val q = corpus.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val brute = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    val ivf = {
      val qScored = q.crossJoin(broadcast(centroids))
        .select($"qid", $"embedding".as("__qv"), $"cid",
          graft.functions.VectorOps.cosine($"embedding", $"cvec").as("ccos"))
      val qw = org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy($"ccos".desc, $"cid")
      val probes = qScored.withColumn("__r", row_number().over(qw)).where($"__r" <= 1)
        .select($"qid", $"__qv", $"cid".as("cell"))
      val scored = assigned.join(broadcast(probes), "cell")
        .select($"qid", $"vec_id", graft.functions.VectorOps.cosine($"embedding", $"__qv").as("cos"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy($"cos".desc, $"vec_id")
      scored.withColumn("rank", row_number().over(w)).where($"rank" === 1)
        .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    }
    assert(ivf == brute, s"single-probe kmeans IVF should be exact on clean clusters: ivf=$ivf brute=$brute")
  }

  test("default ivfTopK (trained k-means quantizer) recalls brute top-5 on clustered data") {
    val rnd = new Random(41)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 6))
    val corpus = (0 until 160).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 0.2).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    // no centroids argument: the user path trains k-means|| internally
    val ivf = Ann.ivfTopK(corpus, q, "vec_id", "embedding", "qid", k = 5, nCentroids = 4, nprobe = 2)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val brute = Ann.bruteTopK(corpus, q, "vec_id", "embedding", "qid", k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"trained-quantizer recall@5 must be >= 0.9, got $recall")
  }
}
