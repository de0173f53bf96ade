package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(texts: String*): Seq[(Long, Long, String)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(
        TextOps.emailCount(col("t")).cast("long"),
        TextOps.phoneCount(col("t")).cast("long"),
        TextOps.redactPii(col("t")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  test("emails and phones are found and scrubbed") {
    val Seq(out) = redact("mail a.user+tag@sub.example.org or call +1-555-0123-99 today")
    assert(out == ((1L, 1L, "mail <EMAIL> or call <PHONE> today")))
  }

  test("plain prose and short numbers survive untouched") {
    val Seq(out) = redact("meet at 5 pm on floor 12, room 300-b, cost 42-50 dollars")
    assert(out == ((0L, 0L, "meet at 5 pm on floor 12, room 300-b, cost 42-50 dollars")))
  }

  test("digits inside an email are not double-counted as a phone") {
    // the local part looks phone-ish; email redaction must claim it first
    val Seq(out) = redact("reach 555-0123-99@example.com now")
    assert(out == ((1L, 0L, "reach <EMAIL> now")))
  }

  test("multiple hits all redact (global replace)") {
    val Seq(out) = redact("a@b.co and c@d.org; 12345-6789 then 98765-4321")
    assert(out._1 == 2L && out._2 == 2L)
    assert(out._3 == "<EMAIL> and <EMAIL>; <PHONE> then <PHONE>")
  }
}
