package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled baseline-JPEG codec: closed-form round-trip of the
  * constant-tile contract, pixel-for-pixel cross-validation against
  * the INDEPENDENT JDK ImageIO JPEG decoder (exact on DC-only images,
  * ±1 on AC-laden ones — integer vs double IDCT), and the
  * None-not-crash robustness contract on hostile bytes.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def tileImage(id: Long): (Int, Int, Array[Int]) = {
    val bw = 1 + (id % 3L).toInt
    val bh = 1 + ((id * 5L + 3L) % 3L).toInt
    val w = 8 * bw
    val h = 8 * bh
    val pix = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((id * 7L + (x / 8) * 31L + (y / 8) * 17L) % 256L).toInt
    }
    (w, h, pix)
  }

  private def imageIoDecode(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO must accept the stream as a JPEG")
    val (w, h) = (img.getWidth, img.getHeight)
    val r = img.getRaster
    (w, h, Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0)))
  }

  test("constant-tile images round-trip the DCT bit-exactly for 60 ids") {
    (0L until 60L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      val enc = JpegCodec.encodeGray(w, h, pix)
      val Some((dw, dh, dec)) = JpegCodec.decodeGrayPixels(enc)
      assert(dw == w && dh == h)
      assert(dec.sameElements(pix), s"id=$id decode must equal the tile contract")
    }
  }

  test("own decoder matches the JDK ImageIO decoder exactly on DC-only images") {
    (0L until 24L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      val enc = JpegCodec.encodeGray(w, h, pix)
      val (iw, ih, ipix) = imageIoDecode(enc)
      assert(iw == w && ih == h, s"id=$id ImageIO dims")
      assert(ipix.sameElements(pix),
        s"id=$id ImageIO must reproduce the tile contract (DC-only blocks decode exactly)")
    }
  }

  test("general content: gradient image decodes within ±1 of ImageIO") {
    // AC coefficients everywhere — quantization is lossy here, so the
    // pin is agreement between the two INDEPENDENT decoders (our
    // double IDCT vs ImageIO's integer IDCT), not the source pixels
    val w = 24; val h = 16
    val pix = Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 11) % 256)
    val enc = JpegCodec.encodeGray(w, h, pix)
    val Some((dw, dh, dec)) = JpegCodec.decodeGrayPixels(enc)
    val (iw, ih, ipix) = imageIoDecode(enc)
    assert(dw == w && dh == h && iw == w && ih == h)
    var worst = 0
    var i = 0
    while (i < w * h) {
      worst = math.max(worst, math.abs(dec(i) - ipix(i)))
      i += 1
    }
    assert(worst <= 1, s"independent decoders must agree within ±1, worst=$worst")
  }

  test("entropy stream exercises byte stuffing and survives it") {
    // AC-heavy images produce long entropy streams where 0xFF bytes
    // (which MUST be stuffed as FF00) occur; pin that the case arises
    // and that both decoders agree on exactly those payloads
    val stuffed = (0 until 40).flatMap { seed =>
      val w = 24; val h = 24
      val pix = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (x * (7 + seed) + y * (11 + 3 * seed) + seed * seed) % 256
      }
      val enc = JpegCodec.encodeGray(w, h, pix)
      val hasStuff = (0 until enc.length - 1)
        .exists(i => (enc(i) & 0xff) == 0xff && enc(i + 1) == 0)
      if (hasStuff) Some(enc) else None
    }
    assert(stuffed.nonEmpty, "expected stuffed 0xFF00 bytes in 40 AC-heavy payloads")
    stuffed.take(5).foreach { enc =>
      val Some((w, h, dec)) = JpegCodec.decodeGrayPixels(enc)
      val (iw, ih, ipix) = imageIoDecode(enc)
      assert(w == iw && h == ih)
      var i = 0
      while (i < w * h) {
        assert(math.abs(dec(i) - ipix(i)) <= 1,
          s"stuffed-stream decode must agree with ImageIO at pixel $i")
        i += 1
      }
    }
  }

  private def imageIoDecodeRgb(b: Array[Byte]): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO must accept the stream as a JPEG")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = Array.tabulate(w * h)(i => img.getRGB(i % w, i / w))
    (w, h, px.map(p => (p >> 16) & 0xff), px.map(p => (p >> 8) & 0xff), px.map(_ & 0xff))
  }

  test("color: gray-content 3-component JPEGs round-trip exactly on all channels") {
    // R=G=B=v tiles: the JFIF forward transform lands on Y=v,
    // Cb=Cr=128 after rounding (coefficient sums are exactly 1 and 0
    // in the spec's decimal arithmetic, within 1e-13 in FP), so every
    // component is DC-only and the interleaved round-trip is exact —
    // including the chroma table-id machinery
    (0L until 24L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      val enc = JpegCodec.encodeColor(w, h, pix, pix, pix)
      val Some((dw, dh, r, g, b)) = JpegCodec.decodeRgbPixels(enc)
      assert(dw == w && dh == h)
      assert(r.sameElements(pix) && g.sameElements(pix) && b.sameElements(pix),
        s"id=$id color round-trip must reproduce the gray tile contract on every channel")
      // cross-validate against the independent JDK decoder
      val (iw, ih, ir, ig, ib) = imageIoDecodeRgb(enc)
      assert(iw == w && ih == h)
      assert(ir.sameElements(pix) && ig.sameElements(pix) && ib.sameElements(pix),
        s"id=$id ImageIO must agree exactly on gray-content color streams")
    }
  }

  test("color: truly colored gradient content agrees with ImageIO within a small bound") {
    // distinct per-channel gradients: quantization is lossy and the
    // two decoders use different IDCT/color-conversion arithmetic
    // (double vs libjpeg fixed-point), so the pin is inter-decoder
    // agreement within the conversion's error amplification (~±3)
    val w = 24; val h = 16
    val r0 = Array.tabulate(w * h)(i => ((i % w) * 9 + (i / w) * 3) % 256)
    val g0 = Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 13) % 256)
    val b0 = Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 7 + 60) % 256)
    val enc = JpegCodec.encodeColor(w, h, r0, g0, b0)
    val Some((dw, dh, r, g, b)) = JpegCodec.decodeRgbPixels(enc)
    val (iw, ih, ir, ig, ib) = imageIoDecodeRgb(enc)
    assert(dw == w && dh == h && iw == w && ih == h)
    var worst = 0
    var i = 0
    while (i < w * h) {
      worst = math.max(worst, math.abs(r(i) - ir(i)))
      worst = math.max(worst, math.abs(g(i) - ig(i)))
      worst = math.max(worst, math.abs(b(i) - ib(i)))
      i += 1
    }
    assert(worst <= 3, s"independent decoders must agree within ±3 on color content, worst=$worst")
  }

  test("color: gray wrapper refuses color streams and vice versa") {
    val (w, h, pix) = tileImage(4L)
    val colorEnc = JpegCodec.encodeColor(w, h, pix, pix, pix)
    val grayEnc = JpegCodec.encodeGray(w, h, pix)
    assert(JpegCodec.decodeGrayPixels(colorEnc).isEmpty, "gray decode must refuse 3-component")
    assert(JpegCodec.decodeRgbPixels(grayEnc).isEmpty, "rgb decode must refuse 1-component")
  }

  test("color: hostile truncations return None, never crash or hang") {
    val (w, h, pix) = tileImage(9L)
    val enc = JpegCodec.encodeColor(w, h, pix, pix, pix)
    (0 until enc.length by 5).foreach { n =>
      JpegCodec.decodeRgbPixels(java.util.Arrays.copyOf(enc, n)) // must return
    }
  }

  test("hostile bytes: None, never a crash or a hang") {
    val (w, h, pix) = tileImage(7L)
    val enc = JpegCodec.encodeGray(w, h, pix)
    // every truncation prefix
    (0 until enc.length by 3).foreach { n =>
      JpegCodec.decodeGrayPixels(java.util.Arrays.copyOf(enc, n)) // must return
    }
    // single-byte corruptions across the header and scan
    (2 until math.min(enc.length, 120)).foreach { i =>
      val c = enc.clone()
      c(i) = (c(i) ^ 0x55).toByte
      JpegCodec.decodeGrayPixels(c) // None or a decode — never a throw/hang
    }
    // non-JPEG payloads
    assert(JpegCodec.decodeGrayPixels(Array[Byte](0x89.toByte, 0x50)).isEmpty)
    assert(JpegCodec.decodeGrayPixels(Array.fill[Byte](64)(0x41)).isEmpty)
    val rng = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      val junk = new Array[Byte](1 + rng.nextInt(300))
      rng.nextBytes(junk)
      junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte // valid SOI, garbage after
      JpegCodec.decodeGrayPixels(junk)
    }
  }

  private def tileImage420(id: Long): (Int, Int, Array[Int]) = {
    val mw = 1 + (id % 2L).toInt
    val mh = 1 + ((id * 3L + 1L) % 2L).toInt
    val w = 16 * mw
    val h = 16 * mh
    val pix = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((id * 13L + (x / 8) * 19L + (y / 8) * 37L) % 256L).toInt
    }
    (w, h, pix)
  }

  test("420: gray-content chroma-subsampled JPEGs round-trip exactly on all channels") {
    // gray content → Cb=Cr=128 everywhere, which the 2×2 box average
    // preserves exactly; Y stays constant per 8×8 tile → every block in
    // every plane is DC-only and the full 420 pipeline (4-block luma
    // MCUs, half-res chroma, NN upsample) is bit-exact
    (0L until 24L).foreach { id =>
      val (w, h, pix) = tileImage420(id)
      val enc = JpegCodec.encodeColor420(w, h, pix, pix, pix)
      val Some((dw, dh, r, g, b)) = JpegCodec.decodeRgbPixels(enc)
      assert(dw == w && dh == h)
      assert(r.sameElements(pix) && g.sameElements(pix) && b.sameElements(pix),
        s"id=$id 420 round-trip must reproduce the gray tile contract on every channel")
      // cross-validate against the independent JDK decoder: constant
      // chroma survives ANY upsampling filter, so agreement is exact
      val (iw, ih, ir, ig, ib) = imageIoDecodeRgb(enc)
      assert(iw == w && ih == h)
      assert(ir.sameElements(pix) && ig.sameElements(pix) && ib.sameElements(pix),
        s"id=$id ImageIO must agree exactly on gray-content 420 streams")
    }
  }

  test("420: constant-color image decodes to the source within quantization rounding") {
    // uniform non-gray color: chroma planes are a non-128 constant —
    // the box downsample and NN upsample are exact on constants, so the
    // only loss is YCbCr integer rounding (±1 per channel)
    val w = 32; val h = 16
    val r0 = Array.fill(w * h)(200)
    val g0 = Array.fill(w * h)(80)
    val b0 = Array.fill(w * h)(40)
    val enc = JpegCodec.encodeColor420(w, h, r0, g0, b0)
    val Some((dw, dh, r, g, b)) = JpegCodec.decodeRgbPixels(enc)
    assert(dw == w && dh == h)
    var i = 0
    while (i < w * h) {
      assert(math.abs(r(i) - 200) <= 1 && math.abs(g(i) - 80) <= 1 && math.abs(b(i) - 40) <= 1,
        s"pixel $i: (${r(i)},${g(i)},${b(i)}) vs (200,80,40)")
      i += 1
    }
    // inter-decoder agreement on the same stream (both see constant
    // planes; upsampling filters agree on constants)
    val (iw, ih, ir, ig, ib) = imageIoDecodeRgb(enc)
    assert(iw == w && ih == h)
    i = 0
    while (i < w * h) {
      assert(math.abs(r(i) - ir(i)) <= 1 && math.abs(g(i) - ig(i)) <= 1 && math.abs(b(i) - ib(i)) <= 1,
        s"pixel $i: ours (${r(i)},${g(i)},${b(i)}) vs ImageIO (${ir(i)},${ig(i)},${ib(i)})")
      i += 1
    }
  }

  test("420: hostile truncations return None, never crash or hang") {
    val (w, h, pix) = tileImage420(5L)
    val enc = JpegCodec.encodeColor420(w, h, pix, pix, pix)
    (0 until enc.length by 5).foreach { n =>
      JpegCodec.decodeRgbPixels(java.util.Arrays.copyOf(enc, n)) // must return
    }
    // sampling factors > 2 must be refused: patch Y sampling 0x22→0x33
    val sof = (0 until enc.length - 1).indexWhere(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0)
    assert(sof >= 0)
    val bad = enc.clone()
    // FFC0 len(2) prec(1) h(2) w(2) nc(1) [id samp tq]… → samp₁ at sof+11
    bad(sof + 11) = 0x33.toByte
    assert(JpegCodec.decodeRgbPixels(bad).isEmpty, "sampling 3x3 must be refused")
  }

  test("a baseline stream mislabeled SOF2 is malformed, not mis-decoded") {
    // SOF2 streams are SUPPORTED now (JpegProgressiveSpec), but a
    // baseline BODY under a progressive frame header is still invalid:
    // a [0, 63] scan band is illegal in a progressive frame (DC scans
    // are exactly [0, 0]) — the dispatcher must route it to the
    // progressive path and that path must refuse it.
    val (w, h, pix) = tileImage(3L)
    val enc = JpegCodec.encodeGray(w, h, pix)
    val prog = enc.clone()
    val sof = (0 until prog.length - 1).indexWhere(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)
    assert(sof >= 0)
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeGrayPixels(prog).isEmpty,
      "baseline scan header inside a progressive frame must be refused")
  }

  test("restart intervals: DRI baseline streams decode bit-identically to plain ones") {
    // interval 1 maximizes marker density and hits chunks that end
    // exactly on a byte edge (the unread-pad-byte case the reader's
    // bounded forward scan exists for)
    (0L until 20L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      Seq(1, 2, 5).foreach { ri =>
        val enc = JpegCodec.encodeGray(w, h, pix, restartInterval = ri)
        val Some((dw, dh, dec)) = JpegCodec.decodeGrayPixels(enc)
        assert(dw == w && dh == h)
        assert(dec.sameElements(pix), s"id=$id ri=$ri DRI round-trip")
      }
    }
    // AC-laden content too: predictors reset mid-gradient
    val w = 32; val h = 24
    val pix = Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 11) % 256)
    val plain = JpegCodec.decodeGrayPixels(JpegCodec.encodeGray(w, h, pix))
    val dri = JpegCodec.decodeGrayPixels(JpegCodec.encodeGray(w, h, pix, restartInterval = 3))
    assert(plain.isDefined && dri.isDefined)
    assert(plain.get._3.sameElements(dri.get._3),
      "restart-marker stream must decode to the same pixels")
  }

  test("restart intervals: ImageIO agrees on our DRI streams") {
    val (w, h, pix) = tileImage(7L)
    val enc = JpegCodec.encodeGray(w, h, pix, restartInterval = 1)
    val (iw, ih, ipix) = imageIoDecode(enc)
    assert(iw == w && ih == h)
    assert(ipix.sameElements(pix), "ImageIO must accept and exactly decode the DRI stream")
  }

  test("restart intervals: a corrupted RSTn marker yields None, not garbage") {
    val (w, h, pix) = tileImage(5L)
    val enc = JpegCodec.encodeGray(w, h, pix, restartInterval = 1)
    val rst = (2 until enc.length - 1).indexWhere(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) >= 0xd0 && (enc(i + 1) & 0xff) <= 0xd7)
    assert(rst >= 0, "the stream really contains an RSTn marker")
    val bad = enc.clone()
    bad(rst + 1) = 0xd9.toByte // turn the restart into a premature EOI
    assert(JpegCodec.decodeGrayPixels(bad).isEmpty)
  }
}
