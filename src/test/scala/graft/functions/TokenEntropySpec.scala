package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  test("tokenEntropy: known distributions") {
    val df = Seq(
      (1L, "a b c d"),                 // uniform over 4 -> ln(4)
      (2L, "spam spam spam spam"),     // single token -> 0.0 (not -0.0)
      (3L, "a a b b"),                 // uniform over 2 -> ln(2)
      (4L, "")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.tokenEntropy($"text").as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - math.log(4.0)) < 1e-12)
    assert(out(2L) == 0.0 && java.lang.Double.doubleToLongBits(out(2L)) == 0L,
      "single-token entropy must be +0.0 exactly")
    assert(math.abs(out(3L) - math.log(2.0)) < 1e-12)
  }

  test("tokenEntropy orders repetitive text below diverse text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near rivers"),
      (2L, "buy now buy now buy now buy now buy now buy now")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.tokenEntropy($"text").as("h"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }
}
