package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamingMinhashDedup equals batch minhashDupOf for id-ordered arrival") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val rnd = new scala.util.Random(3)
    def doc() = Seq.fill(15 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    val uniques = (0L until 30L).map(i => Doc(i, doc()))
    val dups = (0 until 10).map(i => Doc(50L + i, uniques(i).text))
    val all = (uniques ++ dups).sortBy(_.doc_id)
    val input = MemoryStream[Doc]
    val q = StreamingFeaturize.streamingMinhashDedup(input.toDS())
      .writeStream.format("memory").queryName("mh_out").outputMode("complete").start()
    try {
      input.addData(all.filter(_.doc_id < 20): _*)
      q.processAllAvailable()
      input.addData(all.filter(_.doc_id >= 20): _*)
      q.processAllAvailable()
      val streamed = spark.table("mh_out")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val batch = graft.dedup.Dedup.minhashDupOf(
          spark.createDataFrame(all.map(d => (d.doc_id, d.text))).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(streamed == batch)
      // the planted duplicates are all caught
      for (i <- 0 until 10) assert(streamed(50L + i).exists(_ <= i.toLong))
    } finally q.stop()
  }

  test("streamingExactDedup: duplicates across micro-batches resolve to first-seen id") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingFeaturize.streamingExactDedup(input.toDS())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(Doc(1, "The quick brown fox!"), Doc(2, "totally different"))
      q.processAllAvailable()
      // batch 2: normalized dup of doc 1 (case/punct differ) + a new doc
      input.addData(Doc(3, "the quick   brown fox"), Doc(4, "another new one"), Doc(5, "the quick brown fox"))
      q.processAllAvailable()
      val out = spark.table("sdedup").as[DedupVerdict].collect()
        .map(v => v.doc_id -> v.dup_of).toMap
      assert(out(1L).isEmpty && out(2L).isEmpty && out(4L).isEmpty)
      assert(out(3L).contains(1L), s"doc 3 should dup to 1, got ${out(3L)}")
      assert(out(5L).contains(1L))
    } finally q.stop()
  }
}
