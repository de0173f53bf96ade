package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSim expression is bit-identical to the declarative fold") {
    val rnd = new scala.util.Random(42)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), Seq.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val both = df.select(
      VectorOps.cosine($"a", $"b").as("fast"),
      VectorOps.cosineDeclarative($"a", $"b").as("slow")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "v")
    val c = df.select(VectorOps.cosine($"v", $"v")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-15)
  }
}
