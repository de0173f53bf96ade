package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Dedup.substringDupStats — the strided-window exact-substring
  * pass (Lee et al. 2107.06499 re-expressed as a span-hash frequency
  * count). The closed-form cases use winLen 16 / stride 4 so small
  * strings exercise multi-span docs.
  */
class SubstringDupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(docs: org.apache.spark.sql.DataFrame) =
    Dedup.substringDupStats(docs, "doc_id", "text", winLen = 16, stride = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))))
      .toMap

  test("verbatim duplicate docs: every span duplicated on both sides") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact copy
      (3L, "completely different content that shares nothing at all here")
    ).toDF("doc_id", "text")
    val out = stats(docs)
    // docs 1/2 are identical → identical span sets → all spans dup
    val (n1, d1, f1) = out(1L)
    assert(n1 > 0 && d1 == n1 && f1 == 1.0, s"clone must be fully duplicated: $n1 $d1 $f1")
    assert(out(2L) == out(1L))
    // doc 3 shares no 16-char window with anything
    val (n3, d3, f3) = out(3L)
    assert(n3 > 0 && d3 == 0L && f3 == 0.0)
  }

  test("partial overlap: an embedded shared paragraph is caught, unique text is not") {
    // shared block long enough to guarantee aligned windows on both
    // sides regardless of prefix alignment: len >= winLen + stride - 1
    val shared = "a common boilerplate banner paragraph that repeats verbatim across documents"
    val docs = Seq(
      (1L, s"unique preamble one ${shared} unique tail one xyz"),
      (2L, s"${shared} totally distinct continuation here"),
      (3L, "no overlap with anything else whatsoever in this corpus entry")
    ).toDF("doc_id", "text")
    val out = stats(docs)
    val (n1, d1, _) = out(1L)
    val (n2, d2, _) = out(2L)
    assert(d1 > 0, s"doc 1 must have duplicated spans, got $d1/$n1")
    assert(d2 > 0, s"doc 2 must have duplicated spans, got $d2/$n2")
    assert(d1 < n1, "doc 1's unique preamble/tail must contribute non-dup spans")
    assert(out(3L)._2 == 0L)
  }

  test("short docs survive with zero spans and null fraction") {
    val docs = Seq((1L, "tiny"), (2L, ""), (3L, "exactly sixteen c")).toDF("doc_id", "text")
    val out = stats(docs)
    assert(out(1L)._1 == 0L && out(1L)._2 == 0L && out(1L)._3.isNaN)
    assert(out(2L)._1 == 0L)
    // norm("exactly sixteen c") = 17 chars -> spans at pos 1 only (17-16+1=2 -> pos 1 is <= 2, stride 4 -> just 1... pos 1)
    assert(out(3L)._1 >= 1L)
  }

  test("span positions follow the stride arithmetic exactly") {
    // 24 normalized chars, winLen 16, stride 4 → starts 1, 5, 9 (≤ 9)
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwx")).toDF("doc_id", "text")
    assert(stats(docs)(1L)._1 == 3L)
  }

  test("skew-safe shape: partial-agg groupBy + join back, never a window on the bare hash") {
    val docs = Seq((1L, "some document text")).toDF("doc_id", "text")
    val plan = Dedup.substringDupStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // a count-only window on the span hash is the 100TB straggler
    // (WindowExec partitions cannot be AQE-split); the corpus frequency
    // must come from partial-aggregated groupBys + a join back
    assert(!plan.contains("Window "), s"no window allowed in the span-frequency path:\n$plan")
    assert(plan.contains("partial_count(1)"),
      s"per-(doc,hash) multiplicity must partial-aggregate map-side before its exchange:\n$plan")
    assert(plan.contains("partial_sum(__k"),
      s"corpus span frequency must partial-aggregate the per-doc counts before its exchange:\n$plan")
    assert(plan.contains("hashpartitioning(__h"),
      s"frequency exchange must key on the 8-byte span hash, not the span text:\n$plan")
  }

  test("hot-key corpus: one banner span across every doc stays value-correct") {
    // the same 32+-char banner pasted into every doc (the guaranteed
    // web-corpus hot key) plus per-doc unique tails
    val banner = "subscribe to our newsletter today for updates "
    val docs = (1L to 40L)
      .map(i => (i, banner + ("x" * 16) + s" unique tail $i ${"y" * i.toInt}"))
      .toDF("doc_id", "text")
    val out = stats(docs)
    assert(out.size == 40)
    // every doc must report at least one duplicated span (the banner)
    out.foreach { case (id, (n, dup, _)) =>
      assert(n > 0 && dup > 0, s"doc $id: n_spans=$n n_dup=$dup")
    }
  }
}
