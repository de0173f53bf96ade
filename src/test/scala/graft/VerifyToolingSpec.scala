package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the verification tooling itself (VERDICT r7 item 6): a silent
  * regression in the JSON escaper or the gate ordering would zero a
  * round's correctness exactly like the round-7 timeout did. */
class VerifyToolingSpec extends AnyFunSuite {

  test("jsonEscape round-trips through a strict JSON parser shape") {
    // every class the escaper handles: quote, backslash, named control
    // chars, an un-named control char, plain text
    val s = "a\"b\\c\nd\re\tf\u0001g"
    assert(Verify.jsonEscape(s) ==
      "\"a\\\"b\\\\c\\nd\\re\\tf\\u0001g\"")
  }

  test("jsonEscape leaves plain SQL untouched apart from quoting") {
    val sql = "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1"
    assert(Verify.jsonEscape(sql) == "\"" + sql + "\"")
  }

  test("jsonEscape escapes every control char below 0x20") {
    (0 until 0x20).foreach { i =>
      val out = Verify.jsonEscape(i.toChar.toString)
      assert(!out.exists(_ < ' '), f"raw control char 0x$i%02x leaked")
      assert(out.startsWith("\"") && out.endsWith("\"") && out.length > 2)
    }
  }

  test("oracle_sql.json assembled from escaped pairs parses as a JSON object") {
    // the exact assembly Verify.main performs, on adversarial keys/values
    val m = Map("q\"1" -> "SELECT\t1\n", "q2" -> "plain")
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    // minimal structural check without a JSON lib: balanced braces, no
    // raw control chars, and an even number of unescaped quotes
    assert(json.head == '{' && json.last == '}')
    assert(!json.exists(_ < ' '))
    var quotes = 0
    var i = 0
    while (i < json.length) {
      if (json(i) == '\\') i += 2
      else { if (json(i) == '"') quotes += 1; i += 1 }
    }
    assert(quotes % 2 == 0, s"unbalanced quotes in $json")
  }

  test("ordered puts every batch query before every stream query, each sorted") {
    val names = Seq("stream_ewma", "dedup_exact", "ts_lag", "stream_cusum", "ann_topk")
    val out = Verify.ordered(names)
    assert(out == Seq("ann_topk", "dedup_exact", "ts_lag", "stream_cusum", "stream_ewma"))
  }

  test("ordered over the real SparkEntry.queries keeps all 97+ names, streams last") {
    val names = SparkEntry.queries.keys.toSeq
    val out = Verify.ordered(names)
    assert(out.sorted == names.sorted, "ordering must not drop or invent queries")
    val firstStream = out.indexWhere(_.startsWith("stream_"))
    if (firstStream >= 0)
      assert(out.drop(firstStream).forall(_.startsWith("stream_")),
        "a batch query appeared after the first stream_ query")
  }

  test("every query has an oracle and every oracle has a query (the driver-gate contract)") {
    // a query without an oracle row silently downgrades to a weaker
    // rows-only check; an oracle without a query is dead SQL the
    // driver would flag — both are contract drift, keep the sets equal
    // The former rows-only allowlist is EMPTY since r16:
    // text_compress_ratio (deflate, not SQL-expressible) now gates
    // against the checked-in python-zlib GOLDEN inlined as a VALUES
    // table — every registered query has a value oracle
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }
}
