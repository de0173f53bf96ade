package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The progressive (SOF2, T.81 Annex G) half of the JPEG codec.
  *
  * The load-bearing pin: successive approximation taken to Al = 0 is
  * LOSSLESS over the quantized coefficients, so progressive decode of
  * an image must be BIT-IDENTICAL to baseline decode of the same image
  * — one assertion covers DC first/refine, banded AC first passes,
  * AC refinement correction bits, and EOB runs at once, on arbitrary
  * content. Cross-validation runs both directions against the JDK
  * ImageIO JPEG codec (an independent libjpeg-derived implementation):
  * ImageIO reads our progressive streams, and our decoder reads
  * ImageIO's MODE_DEFAULT progressive output.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def tileImage(id: Long): (Int, Int, Array[Int]) = {
    val bw = 1 + ((id * 2L + 1L) % 3L).toInt
    val bh = 1 + ((id * 3L + 2L) % 3L).toInt
    val w = 8 * bw
    val h = 8 * bh
    val pix = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((id * 13L + (x / 8) * 37L + (y / 8) * 19L) % 256L).toInt
    }
    (w, h, pix)
  }

  /** Deterministic AC-heavy content: an LCG noise field. */
  private def noiseImage(seed: Long, w: Int, h: Int): Array[Int] = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(w * h) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) & 0xff).toInt
    }
  }

  private def imageIoDecode(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO must accept the stream as a JPEG")
    val (w, h) = (img.getWidth, img.getHeight)
    val r = img.getRaster
    (w, h, Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0)))
  }

  test("constant-tile images round-trip the progressive path bit-exactly for 60 ids") {
    (0L until 60L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      val enc = JpegCodec.encodeGrayProgressive(w, h, pix)
      // the stream really is progressive: an SOF2 marker is present
      assert((0 until enc.length - 1).exists(i =>
        (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc2), s"id=$id SOF2")
      val Some((dw, dh, dec)) = JpegCodec.decodeGrayPixels(enc)
      assert(dw == w && dh == h)
      assert(dec.sameElements(pix), s"id=$id progressive decode must equal the tile contract")
    }
  }

  test("progressive decode is BIT-IDENTICAL to baseline decode on arbitrary content") {
    // same FDCT + quantizer, and successive approximation to Al=0 is
    // lossless — so every pixel of every image must match exactly,
    // exercising AC first bands, refinement correction bits, ZRL-in-
    // refine, and cross-block EOB runs on real coefficient patterns
    (0 until 12).foreach { seed =>
      val w = 8 * (1 + seed % 5)
      val h = 8 * (1 + (seed * 7 + 2) % 4)
      val pix =
        if (seed % 3 == 0) noiseImage(seed.toLong, w, h)
        else if (seed % 3 == 1)
          Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 11) % 256) // gradient
        else
          Array.tabulate(w * h)(i => if (((i % w) / 4 + (i / w) / 4) % 2 == 0) 16 else 240)
      val base = JpegCodec.decodeGrayPixels(JpegCodec.encodeGray(w, h, pix))
      val prog = JpegCodec.decodeGrayPixels(JpegCodec.encodeGrayProgressive(w, h, pix))
      assert(base.isDefined && prog.isDefined, s"seed=$seed both decode")
      assert(base.get._3.sameElements(prog.get._3),
        s"seed=$seed progressive pixels must equal baseline pixels bit-for-bit")
    }
  }

  test("color progressive decode is bit-identical to color baseline decode") {
    (0 until 6).foreach { seed =>
      val w = 16; val h = 16
      val r = noiseImage(seed.toLong * 3 + 1, w, h)
      val g = noiseImage(seed.toLong * 3 + 2, w, h)
      val b = noiseImage(seed.toLong * 3 + 3, w, h)
      val base = JpegCodec.decodeRgbPixels(JpegCodec.encodeColor(w, h, r, g, b))
      val prog = JpegCodec.decodeRgbPixels(JpegCodec.encodeColorProgressive(w, h, r, g, b))
      assert(base.isDefined && prog.isDefined, s"seed=$seed both decode")
      val (_, _, br, bg, bb) = base.get
      val (_, _, pr, pg, pb) = prog.get
      assert(br.sameElements(pr) && bg.sameElements(pg) && bb.sameElements(pb),
        s"seed=$seed color progressive must equal color baseline per channel")
    }
  }

  test("restart intervals (DRI + RSTn in every scan) decode identically") {
    (0 until 6).foreach { seed =>
      val w = 32; val h = 24
      val pix = noiseImage(seed.toLong + 100, w, h)
      val plain = JpegCodec.decodeGrayPixels(JpegCodec.encodeGrayProgressive(w, h, pix))
      val rst = JpegCodec.decodeGrayPixels(
        JpegCodec.encodeGrayProgressive(w, h, pix, restartInterval = 2))
      assert(plain.isDefined && rst.isDefined)
      assert(plain.get._3.sameElements(rst.get._3),
        s"seed=$seed restart-marker stream must decode to the same pixels")
    }
  }

  test("ImageIO decodes our progressive streams: exact on DC-only, within ±1 on AC-laden") {
    (0L until 12L).foreach { id =>
      val (w, h, pix) = tileImage(id)
      val enc = JpegCodec.encodeGrayProgressive(w, h, pix)
      val (iw, ih, ipix) = imageIoDecode(enc)
      assert(iw == w && ih == h, s"id=$id ImageIO dims")
      assert(ipix.sameElements(pix), s"id=$id DC-only progressive decodes exactly in ImageIO")
    }
    val w = 24; val h = 16
    val pix = noiseImage(7L, w, h)
    val enc = JpegCodec.encodeGrayProgressive(w, h, pix)
    val Some((_, _, ours)) = JpegCodec.decodeGrayPixels(enc)
    val (_, _, theirs) = imageIoDecode(enc)
    val worst = ours.indices.map(i => math.abs(ours(i) - theirs(i))).max
    assert(worst <= 1, s"independent decoders must agree within ±1, worst=$worst")
  }

  test("our decoder reads ImageIO's own MODE_DEFAULT progressive output") {
    val w = 32; val h = 16
    val pix = noiseImage(11L, w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < w * h) { img.getRaster.setSample(i % w, i / w, 0, pix(i)); i += 1 }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    assert(param.canWriteProgressive, "JDK JPEG writer supports progressive mode")
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    writer.dispose()
    val bytes = baos.toByteArray
    // the JDK writer really emitted SOF2 (else this test pins nothing)
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "ImageIO MODE_DEFAULT output must be progressive (SOF2)")
    val ours = JpegCodec.decodeGrayPixels(bytes)
    assert(ours.isDefined, "our decoder must accept ImageIO's progressive stream")
    val (dw, dh, dec) = ours.get
    val (iw, ih, ipix) = imageIoDecode(bytes)
    assert(dw == iw && dh == ih && dw == w && dh == h)
    val worst = dec.indices.map(i => math.abs(dec(i) - ipix(i))).max
    assert(worst <= 1,
      s"our decode of a foreign progressive stream must agree with ImageIO within ±1, worst=$worst")
  }

  test("our decoder reads ImageIO's progressive COLOR output (foreign scan script + sampling)") {
    val w = 32; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rnd = noiseImage(13L, w, h)
    var i = 0
    while (i < w * h) {
      img.setRGB(i % w, i / w,
        (rnd(i) << 16) | (rnd((i * 7 + 3) % (w * h)) << 8) | rnd((i * 13 + 5) % (w * h)))
      i += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    writer.dispose()
    val bytes = baos.toByteArray
    assert((0 until bytes.length - 1).exists(k =>
      (bytes(k) & 0xff) == 0xff && (bytes(k + 1) & 0xff) == 0xc2), "SOF2 color stream")
    // fancyChroma: the JDK writer emits 4:2:0 and its reader upsamples
    // with libjpeg's triangle filter — replication would diverge by
    // ~10 mean / 73 peak on noise chroma while luma stays exact
    // (measured during bring-up; the filter choice, not the decode)
    val ours = JpegCodec.decodeRgbPixels(bytes, fancyChroma = true)
    assert(ours.isDefined, "our decoder must accept the foreign progressive color stream")
    val (dw, dh, r, g, b) = ours.get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(dw == ref.getWidth && dh == ref.getHeight)
    // the stream really is subsampled: this exercises interleaved DC
    // scans with h×v luma blocks AND per-component AC scans over the
    // half-resolution chroma grids
    // FF C2 len(2) prec(1) h(2) w(2) nc(1) id(1) samp → samp at k+11
    assert((0 until bytes.length - 11).exists(k =>
      (bytes(k) & 0xff) == 0xff && (bytes(k + 1) & 0xff) == 0xc2 &&
        (bytes(k + 11) & 0xff) == 0x22), "JDK color output is 4:2:0 progressive")
    // same coefficients, same upsampler family, different IDCT/color
    // precision: the baseline color spec's ±3 bound
    var worst = 0
    var p = 0
    while (p < dw * dh) {
      val rgb = ref.getRGB(p % dw, p / dw)
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - r(p)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - g(p)))
      worst = math.max(worst, math.abs((rgb & 0xff) - b(p)))
      p += 1
    }
    assert(worst <= 3,
      s"foreign progressive color decode must agree with ImageIO within ±3, worst=$worst")
  }

  test("hostile bytes: None, never a crash") {
    val (w, h, pix) = tileImage(3L)
    val enc = JpegCodec.encodeGrayProgressive(w, h, pix)
    // every truncation point
    (0 until enc.length).foreach { n =>
      JpegCodec.decodeGrayPixels(java.util.Arrays.copyOf(enc, n)) // must not throw
    }
    // deterministic single-byte corruptions: decode returns Some or
    // None, never throws or hangs
    (0 until enc.length by 3).foreach { i =>
      val mut = enc.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      JpegCodec.decodeGrayPixels(mut)
    }
    // a progressive stream with its EOI stripped
    assert(JpegCodec.decodeGrayPixels(java.util.Arrays.copyOf(enc, enc.length - 2)).isEmpty)
  }
}
