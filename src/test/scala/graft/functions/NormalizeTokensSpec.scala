package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NormalizeKernel must be bit-identical to the declarative
  * lower→strip→collapse→trim→split pipeline — on adversarial edge
  * strings AND on the real documents corpus (which every text oracle
  * hashes against).
  */
class NormalizeTokensSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "   ", "a", "A", " a ", "a  b", "  A!!B  c ",
    "UPPER lower 123", "tabs\tand\nnewlines", "dots...and---dashes",
    "ünïcode ÄÖÜ ß tokens", "mixed Ünicode and ASCII!", "İstanbul I ı",
    "0123456789", "!@#$%^&*()", "a!b@c#d", "é", " é ", "ça va bien",
    "日本語テキスト and english", "emoji 😀 inside", "x" * 500)

  test("kernel normalize/tokens == declarative on edge strings") {
    val df = edge.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s").repartition(2)
    val rows = df.select(
      TextOps.normalize(col("s")).as("kn"),
      TextOps.normalizeDeclarative(col("s")).as("dn"),
      TextOps.tokens(col("s")).as("kt"),
      TextOps.tokensDeclarative(col("s")).as("dt"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"normalize mismatch for ${r.getString(4).take(40)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"tokens mismatch for ${r.getString(4).take(40)}")
    }
  }

  test("bpeishCount: vertical tab is whitespace, not a token (Java-\\s vs RE2-\\s)") {
    // Java's ASCII \s includes VT (0x0B), RE2's excludes it — the old
    // `[^A-Za-z0-9\s]` tail made DuckDB count a token per VT that the
    // Spark side never saw (22 real-corpus docs diverged, r18). The
    // explicit class pins the agreed contract: VT separates, like \t.
    val rows = Seq(
      ("a\u000Bb", 2),   // two letter runs split by VT, VT not counted
      ("a b", 2),
      ("a.b", 3),        // punctuation IS a token
      ("\u000B\u000B", 0)
    ).toDF("s", "exp")
    rows.select(TextOps.bpeishCount(col("s")).as("got"), col("exp")).collect()
      .foreach(r => assert(r.getAs[Int]("got") == r.getAs[Int]("exp"), r.toString))
  }

  test("kernel normalize/tokens == declarative on the sf0.001 documents corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
        TextOps.normalize(col("text")).as("kn"),
        TextOps.normalizeDeclarative(col("text")).as("dn"),
        TextOps.tokens(col("text")).as("kt"),
        TextOps.tokensDeclarative(col("text")).as("dt"))
      .where(col("kn") =!= col("dn") || col("kt") =!= col("dt"))
      .count()
    assert(bad == 0)
  }
}
