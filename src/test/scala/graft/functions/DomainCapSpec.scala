package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the web_domain_cap shape: corpus-adaptive per-host rate cap by
  * deterministic id hash — ONE host rollup broadcast back, verdict
  * map-only, no host-partitioned window (hosts are Zipfian).
  */
class DomainCapSpec extends SparkSpec {
  import spark.implicits._

  private def capFrame(docs: org.apache.spark.sql.DataFrame, cap: Long) = {
    val scored = docs.select(col("doc_id"),
      concat(col("source"), lit(".example.com")).as("host"),
      Sampling.hashBucket(col("doc_id"), 10000).as("__b"))
    val counts = scored.groupBy("host").agg(count(lit(1)).as("n_host_docs"))
    scored.join(broadcast(counts), Seq("host"))
      .select(col("doc_id"), col("host"), col("n_host_docs"),
        (col("__b") * col("n_host_docs") < lit(cap * 10000L)).as("kept"))
  }

  test("megahost is rate-capped to ~cap, small hosts keep everything") {
    // one Zipf head host with 2,000 docs, one tail host with 20
    val docs = ((0 until 2000).map(i => (i.toLong, "mega")) ++
      (0 until 20).map(i => (10000L + i, "tiny"))).toDF("doc_id", "source")
    val out = capFrame(docs, cap = 50).collect()
    val mega = out.filter(_.getString(1) == "mega.example.com")
    val tiny = out.filter(_.getString(1) == "tiny.example.com")
    val megaKept = mega.count(_.getBoolean(3))
    assert(mega.length == 2000 && megaKept > 25 && megaKept < 80,
      s"megahost must be capped near 50, kept $megaKept")
    // tiny host: bucket·20 < 500,000 always (bucket ≤ 9999) → all kept
    assert(tiny.length == 20 && tiny.forall(_.getBoolean(3)),
      "a host under the cap keeps every doc")
  }

  test("verdict is deterministic and corpus-adaptive (same doc flips only with host size)") {
    val small = (0 until 100).map(i => (i.toLong, "s")).toDF("doc_id", "source")
    val a = capFrame(small, 50).collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val b = capFrame(small, 50).collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(a == b, "re-run must produce identical verdicts")
  }

  test("scale shape: host rollup broadcasts back, no window, verdict map-only") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = capFrame(docs, 50).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"host count table must broadcast:\n${plan.take(1500)}")
    assert(!plan.toLowerCase.contains("windowspecdefinition"),
      s"no host-partitioned window (Zipfian hosts):\n${plan.take(1500)}")
    assert(plan.contains("partial_count"),
      s"host rollup must map-side combine:\n${plan.take(1500)}")
  }
}
