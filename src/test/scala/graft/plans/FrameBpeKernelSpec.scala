package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r21 optimization kernels: parity pins against the declarative forms
  * they replaced.
  *  - FrameMd5Kernel ≡ md5(substr(t, idx·fc + 1, fc)) over the kept
  *    frame indices (multi-byte chars, clipped tails, empty payloads);
  *  - BpeCountKernel ≡ size after the chained mergeOnce fold
  *    (overlap runs, multi-round chains that consume fused symbols).
  */
class FrameBpeKernelSpec extends SparkSpec {

  test("FrameMd5Kernel ≡ md5(substr) chain — ASCII, multi-byte, clipped tail, empty") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789", // clean multiple-of-fc splits
      "short",                                // single clipped frame
      "exactly8",                             // exactly one frame at fc=8
      "",                                     // zero frames
      "héllo wörld — ünïcode pâyload ✓ with multi-byte °chars° spanning frames",
      "日本語テキストのフレーム分割テスト、マルチバイト境界")
    for (fc <- Seq(4, 8, 12); every <- Seq(1, 2, 3)) {
      val df = texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())
      val kernel = graft.multimodal.Multimodal.sampleFrames(df, "doc_id", "text", fc, every)
        .orderBy("doc_id", "frame_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // the pre-r21 declarative form, verbatim
      val n = expr(s"(length(text) + ${fc - 1}) div $fc")
      val idxs = when(n > 0, sequence(lit(0L), n - 1)).otherwise(array().cast("array<bigint>"))
      val decl = df.select(col("doc_id"), col("text"), explode(idxs).as("frame_idx"))
        .where(pmod(col("frame_idx"), lit(every.toLong)) === 0)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("text").substr(col("frame_idx") * fc + 1, lit(fc))).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(kernel.toSeq == decl.toSeq, s"fc=$fc every=$every")
    }
  }

  test("BpeCountKernel ≡ chained mergeOnce fold sizes (overlaps, fused-symbol chains)") {
    val s = spark
    import s.implicits._
    val words = Seq("xxxx", "xxx", "abab", "aab", "banana", "mississippi",
      "a", "", "zz", "xyxyxy")
    val merges = Seq(("x", "x"), ("xx", "x"), ("a", "b"), ("an", "a"),
      ("s", "s"), ("i", "ss"))
    // TokenizerStats.mergeOnce verbatim (private[functions]; inlined so
    // this spec stays an INDEPENDENT twin of the fold semantics)
    def mergeOnceDecl(syms: org.apache.spark.sql.Column, a: String, b: String) =
      aggregate(syms, array().cast("array<string>"),
        (acc, x) => when(
          get(acc, size(acc) - 1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    val df = words.toDF("__w")
      .withColumn("__s", array_remove(split(col("__w"), ""), ""))
    val viaFold = merges.foldLeft(df) { case (d, (a, b)) =>
      d.withColumn("__s", mergeOnceDecl(col("__s"), a, b))
    }.select(col("__w"), size(col("__s")).cast("long").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val viaKernel = df.select(col("__w"),
        graft.plans.TextHashKernels.bpeCount(col("__s"), merges).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaKernel == viaFold)
  }
}
