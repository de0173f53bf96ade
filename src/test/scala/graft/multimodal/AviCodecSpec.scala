package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the MJPEG-in-AVI container codec (r16): RIFF chunk-walk
  * round-trip, the hostile-bytes contract every codec here carries,
  * writer up-front validation, and the stats composition against a
  * brute-force decode of the same payloads.
  */
class AviCodecSpec extends SparkSpec {
  import spark.implicits._

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    // constant 8x8 tiles: DC-only blocks, bit-exact JPEG round-trip
    val pix = Array.tabulate(w * h)(i => (seed + ((i % w) / 8) * 31 + ((i / w) / 8) * 23) % 256)
    JpegCodec.encodeGray(w, h, pix)
  }

  test("round-trip: write N MJPEG frames, parse back, JPEG-decode each bit-exactly") {
    val frames = (0 until 3).map(f => jpeg(16, 8, 40 + f * 41))
    val avi = AviCodec.write(16, 8, frames, usPerFrame = 33333)
    val v = AviCodec.parse(avi).get
    assert(v.width == 16 && v.height == 8 && v.usPerFrame == 33333)
    assert(v.frames.length == 3)
    v.frames.zip(frames).foreach { case (got, exp) =>
      assert(java.util.Arrays.equals(got, exp), "frame payload must survive the container")
      val (w, h, pix) = JpegCodec.decodeGrayPixels(got).get
      assert(w == 16 && h == 8 && pix.length == 128)
    }
  }

  test("odd-length frame payloads pad to even chunk boundaries without corruption") {
    // craft an odd-length JPEG by picking content whose encoding is odd;
    // try a few seeds until one encodes odd (entropy length varies)
    val odd = (0 until 64).map(s => jpeg(8, 8, s)).find(_.length % 2 == 1)
    assume(odd.isDefined, "no odd-length payload found")
    val frames = Seq(odd.get, jpeg(8, 8, 7), odd.get)
    val v = AviCodec.parse(AviCodec.write(8, 8, frames)).get
    assert(v.frames.length == 3)
    v.frames.zip(frames).foreach { case (g, e) => assert(java.util.Arrays.equals(g, e)) }
  }

  test("hostile bytes: None, never a crash") {
    val good = AviCodec.write(8, 8, Seq(jpeg(8, 8, 1)))
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "RIFF".getBytes("US-ASCII"),
      "JUNKJUNKJUNKJUNKJUNKJUNK".getBytes("US-ASCII"),
      good.take(30),                       // truncated inside hdrl
      good.dropRight(3),                   // truncated riff body
      {                                    // absurd declared chunk size
        val b = good.clone(); b(4) = 0xff.toByte; b(5) = 0xff.toByte
        b(6) = 0xff.toByte; b(7) = 0x7f.toByte; b
      },
      {                                    // absurd dims in avih (width u32 @ 8+32 past avih data start)
        val b = good.clone()
        // avih data starts at 12 (RIFF hdr) + 12 (LIST hdr+kind) + 8 (avih hdr) = 32
        val at = 32 + 32
        b(at) = 0xff.toByte; b(at + 1) = 0xff.toByte; b(at + 2) = 0xff.toByte; b(at + 3) = 0x7f.toByte
        b
      })
    cases.foreach(c => assert(AviCodec.parse(c).isEmpty, s"must reject ${c.length} bytes"))
    assert(AviCodec.parse(good).isDefined)
  }

  test("writer validates up front: dims, frame count, non-JPEG payloads are LOUD") {
    def bad(f: => Any): String = intercept[IllegalArgumentException](f).getMessage
    assert(bad(AviCodec.write(0, 8, Seq(jpeg(8, 8, 1)))).contains("bad dims"))
    assert(bad(AviCodec.write(8, 8, Nil)).contains("frame count"))
    assert(bad(AviCodec.write(8, 8, Seq("notajpeg".getBytes("US-ASCII"))))
      .contains("SOI missing"))
    assert(bad(AviCodec.write(8, 8, Seq(jpeg(8, 8, 1)), usPerFrame = 0))
      .contains("frame interval"))
  }

  test("aviVideoStats matches a brute-force walk of the synthesized payloads") {
    val df = Seq(1L, 2L, 5L, 8L, 11L).toDF("doc_id")
    val stats = Multimodal.aviVideoStats(
      Multimodal.synthAvis(df, "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    for (r <- stats) {
      val id = r.getLong(0)
      val nf = 1 + (id % 4L).toInt
      val bw = 1 + (id % 3L).toInt
      val bh = 1 + ((id * 5L + 3L) % 3L).toInt
      assert(r.getLong(1) == nf && r.getLong(2) == 8L * bw && r.getLong(3) == 8L * bh, r.toString)
      // brute-force closed form
      val vals = for { f <- 0 until nf; bx <- 0 until bw; by <- 0 until bh }
        yield (id * 7L + bx * 31L + by * 23L + (f / 2) * 41L) % 256L
      assert(r.getLong(4) == vals.sum * 64L, s"sum: $r")
      assert(r.getLong(5) == vals.min && r.getLong(6) == vals.max, s"min/max: $r")
      assert(r.getLong(7) == 1L + (nf - 1) / 2, s"scenes: $r")
      assert(r.getLong(8) == math.min(nf, 2).toLong, s"longest: $r")
    }
  }

  test("undecodable payloads emit null fields, not crashes") {
    val df = Seq((1L, "not an avi".getBytes("US-ASCII")), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val rows = Multimodal.aviVideoStats(df, "doc_id", "payload").orderBy("doc_id").collect()
    assert(rows.length == 2 && rows.forall(r => r.isNullAt(1) && r.isNullAt(7)))
  }

  test("container/JPEG dim disagreement yields nulls (a lying header is not trusted)") {
    // wrap an 8x8 JPEG in a container claiming 16x8
    val avi = AviCodec.write(16, 8, Seq(jpeg(8, 8, 3)))
    val row = Multimodal.aviVideoStats(
      Seq((9L, avi)).toDF("doc_id", "payload"), "doc_id", "payload").collect().head
    assert(row.isNullAt(1), row.toString)
  }
}
