package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 300),
    (2L, "hello multimodal world"),
    (3L, "b" * 130))
    .toDF("doc_id", "text")

  test("PNG/JPEG header parsers recover dimensions from real bytes; reject garbage") {
    // round-trip through the synthesizers (valid minimal files)
    assert(Multimodal.parsePng(Multimodal.synthPng(640, 480)) == Some((640, 480)))
    assert(Multimodal.parseJpeg(Multimodal.synthJpeg(1920, 1080)) == Some((1920, 1080)))
    // parsers are format-strict both ways
    assert(Multimodal.parsePng(Multimodal.synthJpeg(640, 480)).isEmpty)
    assert(Multimodal.parseJpeg(Multimodal.synthPng(640, 480)).isEmpty)
    // JPEG parse must skip the APP0 segment to reach SOF0 — and not be
    // fooled by FF C0 bytes INSIDE a segment payload
    val withDecoy = {
      val b = Multimodal.synthJpeg(33, 44)
      // plant a fake SOF marker inside APP0's thumbnail bytes
      b(16) = 0xff.toByte; b(17) = 0xc0.toByte
      b
    }
    assert(Multimodal.parseJpeg(withDecoy) == Some((33, 44)))
    // truncation and garbage → None, not a crash
    assert(Multimodal.parsePng(Multimodal.synthPng(1, 1).take(20)).isEmpty)
    assert(Multimodal.parseJpeg(Multimodal.synthJpeg(1, 1).take(6)).isEmpty)
    assert(Multimodal.parsePng(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(Multimodal.parseJpeg(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(Multimodal.parseImageMeta("not an image".getBytes) == ((null, null, null)))
  }

  test("WAV parser recovers audio params through a skippable LIST chunk; rejects garbage") {
    assert(Multimodal.parseWav(Multimodal.synthWav(2, 44100, 16, 1234)) == Some((2, 44100, 16, 1234L)))
    assert(Multimodal.parseWav(Multimodal.synthWav(1, 8000, 8, 5)) == Some((1, 8000, 8, 5L)))
    // truncated before fmt, garbage, and a PNG are all None, no crash
    assert(Multimodal.parseWav(Multimodal.synthWav(1, 8000, 16, 10).take(20)).isEmpty)
    assert(Multimodal.parseWav(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(Multimodal.parseWav(Multimodal.synthPng(8, 8)).isEmpty)
  }

  test("synthAudio → audioMeta round-trip: parsed params equal the arithmetic spec") {
    val meta = Multimodal.audioMeta(Multimodal.synthAudio(docs.select("doc_id"), "doc_id"),
      "doc_id", "payload").orderBy("doc_id").collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1 + id % 2, "channels")
      assert(r.getLong(2) == 8000 + (id % 8) * 4000, "sample_rate")
      assert(r.getLong(3) == 16, "bits")
      assert(r.getLong(4) == 100 + id % 400, "n_samples")
    }
  }

  test("synthImages → imageMeta round-trip: parsed dims equal the arithmetic spec") {
    val ids = docs.select("doc_id")
    val meta = Multimodal.imageMeta(Multimodal.synthImages(ids, "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(meta.map(_.getString(1)).toSeq == Seq("jpeg", "png", "jpeg"))
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == 16 + id % 1000, "width")
      assert(r.getLong(3) == 16 + (id * 7 + 13) % 1000, "height")
      assert(r.getLong(4) == (if (id % 2 == 0) 45 else 35), "n_bytes")
    }
  }

  test("BMP pixel decode: stats computed from REAL pixel bytes match closed form") {
    // direct round-trip: B = base+x+y, G = base+2x, R = base+3y
    val (w, h, base) = (5, 4, 10)
    val Some((pw, ph, means, mins, maxs)) = Multimodal.parseBmpPixels(Multimodal.synthBmp(w, h, base))
    assert((pw, ph) == ((w, h)))
    assert(means(0) == base + (w - 1) / 2.0 + (h - 1) / 2.0, "mean_b")
    assert(means(1) == base + (w - 1).toDouble, "mean_g")
    assert(means(2) == base + 1.5 * (h - 1), "mean_r")
    assert(mins.toSeq == Seq(base, base, base))
    assert(maxs.toSeq == Seq(base + w + h - 2, base + 2 * (w - 1), base + 3 * (h - 1)))
    // stride padding: widths not divisible by 4 must not leak pad bytes
    // into the stats (w=5 → stride 16 ≠ 15); w=4 → stride 12 exact
    val Some((_, _, m4, _, _)) = Multimodal.parseBmpPixels(Multimodal.synthBmp(4, 3, 7))
    assert(m4(1) == 7 + 3.0, "mean_g with exact stride")
    // rejects garbage / truncation / other formats, no crash
    assert(Multimodal.parseBmpPixels(Multimodal.synthBmp(5, 4, 10).take(40)).isEmpty)
    assert(Multimodal.parseBmpPixels(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(Multimodal.parseBmpPixels(Multimodal.synthPng(8, 8)).isEmpty)
  }

  test("synthBitmaps → bmpPixelStats round-trip equals the arithmetic spec") {
    val stats = Multimodal.bmpPixelStats(Multimodal.synthBitmaps(docs.select("doc_id"), "doc_id"),
      "doc_id", "payload").orderBy("doc_id").collect()
    assert(stats.length == 3)
    stats.foreach { r =>
      val id = r.getLong(0)
      val w = 8 + id % 9; val h = 8 + (id * 5 + 3) % 9; val base = id % 64
      assert(r.getLong(1) == w && r.getLong(2) == h, "dims")
      assert(r.getDouble(3) == base + (w - 1) / 2.0 + (h - 1) / 2.0, "mean_b")
      assert(r.getDouble(4) == base + (w - 1).toDouble, "mean_g")
      assert(r.getDouble(5) == base + 1.5 * (h - 1), "mean_r")
      assert(r.getLong(6) == base && r.getLong(7) == base + w + h - 2, "b range")
      assert(r.getLong(11) == base + 3 * (h - 1), "max_r")
    }
  }

  test("PCM decode: stats from REAL sample bytes match the sample formula") {
    val stats = Multimodal.audioPcmStats(
      Multimodal.synthAudioPcm(docs.select("doc_id"), "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(stats.length == 3)
    stats.foreach { r =>
      val id = r.getLong(0)
      val n = 100 + (id % 400).toInt
      val samples = (0 until n).map(i => Multimodal.pcmSample(id, i).toLong)
      assert(r.getLong(1) == n, "n_samples")
      assert(r.getLong(2) == samples.sum, "sum_amp")
      assert(r.getLong(3) == samples.map(v => v * v).sum, "sum_sq")
      assert(r.getLong(4) == samples.min && r.getLong(5) == samples.max, "min/max")
    }
    // non-PCM-16 / garbage / truncation → None, not a crash
    assert(Multimodal.parseWavPcmStats(Multimodal.synthWav(1, 8000, 8, 5)).isEmpty, "8-bit rejected")
    assert(Multimodal.parseWavPcmStats(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(Multimodal.parseWavPcmStats(Multimodal.synthWav(1, 8000, 16, 50).take(30)).isEmpty)
    // zero-filled 16-bit PCM decodes to all-zero stats (valid file)
    val Some((ch, n0, s0, sq0, mn0, mx0)) =
      Multimodal.parseWavPcmStats(Multimodal.synthWav(2, 44100, 16, 10))
    assert(ch == 2 && n0 == 20 && s0 == 0 && sq0 == 0 && mn0 == 0 && mx0 == 0)
  }

  test("decodeStub: batched per-partition decode emits one feature row per payload") {
    val withBin = Multimodal.withBinary(docs, "text")
    val out = Multimodal.decodeStub(withBin, "doc_id", "payload", batchSize = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(1) == 300)
    val feat = out(1).getSeq[Float](2)
    assert(feat.length == 4 && feat.exists(_ != 0f))
  }

  test("sceneStats: repeated frames merge into scenes, boundaries counted exactly") {
    // frames of doc 1: A A B A → 3 scenes, longest run 2
    val text = ("A" * 64) + ("A" * 64) + ("B" * 64) + ("A" * 64)
    val d = Seq((1L, text), (2L, "C" * 64)).toDF("doc_id", "text")
    val out = Multimodal.sceneStats(d, "doc_id", "text", frameChars = 64)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 4L, 3L, 2L), (2L, 1L, 1L, 1L)), out.mkString(", "))
  }

  test("PNG full decode: inflate + all 5 filter types reconstruct exact pixels") {
    // each filter type alone, then the mixed per-row rotation
    val filters = Seq[Int => Int](_ => 0, _ => 1, _ => 2, _ => 3, _ => 4, y => y % 5)
    filters.zipWithIndex.foreach { case (f, fi) =>
      val (w, h, base) = (11, 9, 40)
      val Some((pw, ph, means, mins, maxs)) =
        Multimodal.parsePngPixels(Multimodal.synthPngRgb(w, h, base, f))
      assert(pw == w && ph == h, s"dims, filter case $fi")
      assert(means(0) == base + 1.5 * (h - 1), s"mean_r, filter case $fi")
      assert(means(1) == base + (w - 1).toDouble, s"mean_g, filter case $fi")
      assert(means(2) == base + (w - 1) / 2.0 + (h - 1) / 2.0, s"mean_b, filter case $fi")
      assert(mins.toSeq == Seq(base, base, base), s"mins, filter case $fi")
      assert(maxs.toSeq == Seq(base + 3 * (h - 1), base + 2 * (w - 1), base + (w - 1) + (h - 1)),
        s"maxs, filter case $fi")
    }
  }

  test("PNG synth is a VALID file: the JDK's own ImageIO PNG decoder agrees pixel-for-pixel") {
    // independent decoder cross-check — javax.imageio ships its own PNG
    // reader; if our Deflater/filter/CRC encoding were wrong anywhere,
    // ImageIO would reject the file or disagree on pixel values
    val (w, h, base) = (13, 12, 35)
    val bytes = Multimodal.synthPngRgb(w, h, base, y => y % 5)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the synthesized PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == base + 3 * y, s"R($x,$y)")
      assert(((rgb >> 8) & 0xff) == base + 2 * x, s"G($x,$y)")
      assert((rgb & 0xff) == base + x + y, s"B($x,$y)")
    }
    // the payload really is multi-IDAT (decoder must concatenate)
    val idatCount = bytes.sliding(4).count(s =>
      s(0) == 'I' && s(1) == 'D' && s(2) == 'A' && s(3) == 'T')
    assert(idatCount == 2, s"expected 2 IDAT chunks, saw $idatCount")
  }

  test("PNG decode rejects garbage, truncation, and hostile chunk lengths without crashing") {
    val good = Multimodal.synthPngRgb(9, 9, 10, _ => 4)
    assert(Multimodal.parsePngPixels(good).isDefined)
    assert(Multimodal.parsePngPixels(good.take(40)).isEmpty, "truncated mid-IDAT")
    assert(Multimodal.parsePngPixels(Array.fill[Byte](64)(0x42)).isEmpty, "garbage")
    assert(Multimodal.parsePngPixels(Multimodal.synthBmp(8, 8, 5)).isEmpty, "BMP")
    assert(Multimodal.parsePngPixels(Multimodal.synthPng(32, 32)).isEmpty,
      "header-only synth (no IDAT) must not decode")
    // corrupt the zlib stream (first IDAT data byte)
    val badZ = good.clone(); badZ(8 + 25 + 8) = 0x77
    assert(Multimodal.parsePngPixels(badZ).isEmpty, "corrupt zlib")
    // hostile declared chunk length: 0x7fffffff walks past the buffer
    val badLen = good.clone()
    badLen(8) = 0x7f.toByte; badLen(9) = 0xff.toByte; badLen(10) = 0xff.toByte; badLen(11) = 0xff.toByte
    assert(Multimodal.parsePngPixels(badLen).isEmpty, "hostile length")
    // interlaced / non-RGB color types are out of scope → None
    val inter = good.clone(); inter(8 + 8 + 12) = 1 // IHDR interlace byte
    assert(Multimodal.parsePngPixels(inter).isEmpty, "interlaced")
  }

  test("synthPngs → pngPixelStats round-trip equals the arithmetic spec") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 17L, 100L, 9999L).toDF("doc_id")
    val out = Multimodal.pngPixelStats(Multimodal.synthPngs(ids, "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.length == 8)
    out.foreach { r =>
      val id = r.getLong(0)
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id * 5 + 3) % 9).toInt
      val base = (id % 64).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h, s"dims id=$id")
      assert(r.getDouble(3) == base + 1.5 * (h - 1), s"mean_r id=$id")
      assert(r.getDouble(4) == base + (w - 1).toDouble, s"mean_g id=$id")
      assert(r.getDouble(5) == base + (w - 1) / 2.0 + (h - 1) / 2.0, s"mean_b id=$id")
      assert(r.getLong(6) == base && r.getLong(7) == base + 3 * (h - 1), s"r range id=$id")
      assert(r.getLong(8) == base && r.getLong(9) == base + 2 * (w - 1), s"g range id=$id")
      assert(r.getLong(10) == base && r.getLong(11) == base + (w - 1) + (h - 1), s"b range id=$id")
    }
  }

  test("flac decode kernels compose into a stream unchanged (stateless): stream == batch") {
    import graft.streaming.{Doc, StreamRunner}
    val ids = (0L until 20L).map(i => Doc(i, s"doc $i"))
    val batch = Multimodal.flacPcmStats(
      Multimodal.synthFlacs(ids.toDF().select("doc_id"), "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect().map(_.toSeq)
    val stream = StreamRunner.run(spark, ids, nChunks = 4, "append")(ds =>
        Multimodal.flacPcmStats(
          Multimodal.synthFlacs(ds.toDF().select("doc_id"), "doc_id"), "doc_id", "payload"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(stream.toSeq == batch.toSeq)
    assert(batch.forall(r => r(6) == true)) // md5 verified on every payload
  }

  test("sampleFrames: every-2nd fixed-width frame with md5 payloads") {
    val out = Multimodal.sampleFrames(docs, "doc_id", "text", frameChars = 128, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // doc 1: 300 chars → 3 frames → sampled 0,2 ; doc 2: 1 frame → 0 ; doc 3: 2 frames → 0
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 2L), (2L, 0L), (3L, 0L)))
    assert(out.forall(_.getString(2).length == 32))
  }
}
