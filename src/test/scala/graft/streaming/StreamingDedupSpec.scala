package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

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
