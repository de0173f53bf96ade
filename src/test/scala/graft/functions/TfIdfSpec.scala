package graft.functions

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple banana date date")).toDF("doc_id", "text")

  test("topTerms ranks corpus-distinctive terms above ubiquitous ones") {
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    assert(out.length == 6) // 2 per doc
    // banana appears in ALL 3 docs → ln(3/3) = 0 → never a top term;
    // every winner has df < 3
    assert(out.forall(_.getLong(4) < 3), out.mkString("; "))
    // doc 2: cherry has tf=2, df=2 → top term
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.head.getString(2) == "cherry" && d2.head.getLong(3) == 2)
    // tfidf values are the rounded tf·ln(N/df)
    out.foreach { r =>
      val expect = BigDecimal(r.getLong(3) * math.log(3.0 / r.getLong(4)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expect, s"tfidf mismatch: $r")
    }
  }

  test("topTerms plan keeps the rank-limit pushdown") {
    val plan = TfIdf.topTerms(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"lost WindowGroupLimit:\n${plan.take(1200)}")
  }
}
