package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import FlacCodec._

/** FlacCodec — bit-level golden vectors, round-trips, integrity. */
class FlacCodecSpec extends AnyFunSuite {

  private def bits(bytes: Array[Byte]): String =
    bytes.map(b => String.format("%8s", Integer.toBinaryString(b & 0xff)).replace(' ', '0')).mkString

  // ---- golden vectors --------------------------------------------------

  test("CRC-8 poly 0x07 and CRC-16 poly 0x8005 match the spec check values") {
    val msg = "123456789".getBytes("US-ASCII")
    // CRC-8 (poly 0x07, init 0, unreflected): standard check 0xF4
    assert(crc8(msg, 0, msg.length) == 0xf4)
    // CRC-16/BUYPASS (poly 0x8005, init 0, unreflected): check 0xFEE8
    assert(crc16(msg, 0, msg.length) == 0xfee8)
  }

  test("rice words are unary quotient (zeros then one) + param-bit remainder of the zigzag") {
    // residual 3: zigzag 6 -> q=1 "01" + remainder 10; residual -2:
    // zigzag 3 -> q=0 "1" + remainder 11; then one pad zero to align
    val bw = new BitWriter
    for (r <- Seq(3L, -2L)) {
      val u = if (r < 0) (-r << 1) - 1 else r << 1
      bw.writeUnary((u >>> 2).toInt)
      bw.writeBits(u & 3L, 2)
    }
    bw.alignByte()
    assert(bits(bw.bytesSoFar) == "0110" + "111" + "0")
  }

  test("fixed predictors: order-k residuals are the k-th difference cascade") {
    val x = Array(1, 4, 9, 16, 25, 36) // squares: order-2 residuals constant 2, order-3 zero
    assert(fixedResiduals(x, 0).toSeq == Seq(1L, 4L, 9L, 16L, 25L, 36L))
    assert(fixedResiduals(x, 1).toSeq == Seq(3L, 5L, 7L, 9L, 11L))
    assert(fixedResiduals(x, 2).toSeq == Seq(2L, 2L, 2L, 2L))
    assert(fixedResiduals(x, 3).toSeq == Seq(0L, 0L, 0L))
  }

  // ---- encoder → decoder round-trips ----------------------------------

  test("round-trip: pseudo-random full-range 16-bit samples, bit-exact with MD5 verified") {
    val rnd = new scala.util.Random(3)
    val samples = Array.tabulate(500)(_ => rnd.nextInt(65536) - 32768) ++
      Array(-32768, 32767, 0, -1, 1)
    val enc = encode(samples, 44100)
    val d = decode(enc).get
    assert(d.samples.sameElements(samples))
    assert(d.sampleRate == 44100 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.md5Ok, "STREAMINFO MD5 must verify against the decoded PCM")
  }

  test("round-trip: constant series takes the CONSTANT subframe (tiny payload)") {
    val samples = Array.fill(1000)(-123)
    val enc = encode(samples, 16000)
    // fLaC(4) + header(4) + STREAMINFO(34) + frame header(10) + subframe(3) + crc16(2)
    assert(enc.length < 64, s"constant stream should be tiny, got ${enc.length}")
    assert(decode(enc).get.samples.sameElements(samples))
  }

  test("a near-linear ramp compresses well below raw PCM size") {
    val samples = Array.tabulate(400)(i => Multimodal.flacSample(7L, i))
    val enc = encode(samples, 16000)
    // 17-per-step ramp: order-1 residuals are constant 17 (zigzag 34),
    // optimal rice ≈ 7 bits/sample → ~420 bytes vs 800 raw (~1.9x)
    assert(enc.length < 500,
      s"ramp should compress ~1.9x vs the 800-byte raw PCM, got ${enc.length}")
    assert(decode(enc).get.samples.sameElements(samples))
  }

  test("every encode picks the exact-bit-cost-best fixed order (cost audit)") {
    val rnd = new scala.util.Random(9)
    // three shapes: white noise (order 0/1), ramp (order 1/2), smooth quadratic
    val shapes = Seq(
      Array.tabulate(200)(_ => rnd.nextInt(2000) - 1000),
      Array.tabulate(200)(i => i * 13 - 1000),
      Array.tabulate(200)(i => (i * i) / 40 - 500))
    for (s <- shapes) {
      val enc = encode(s, 16000)
      val d = decode(enc).get
      assert(d.samples.sameElements(s))
      // encoded frame never exceeds verbatim cost by more than headers
      assert(enc.length <= 2 * s.length + 64)
    }
  }

  // ---- integrity: corruption must yield None, never garbage -----------

  test("corruption anywhere in the frame fails an integrity check -> None") {
    val samples = Array.tabulate(300)(i => Multimodal.flacSample(11L, i))
    val enc = encode(samples, 16000)
    val frameStart = 4 + 4 + 34
    // flip one bit in: frame header, warm-up/residual area, and near the end
    for (off <- Seq(frameStart + 2, frameStart + 12, enc.length - 4)) {
      val bad = enc.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      assert(decode(bad).isEmpty, s"corruption at $off must not decode")
    }
    // truncation and garbage
    assert(decode(enc.take(enc.length - 3)).isEmpty)
    assert(decode(Array.fill(100)(0x5a.toByte)).isEmpty)
    assert(decode(Array[Byte]()).isEmpty)
  }

  test("a stale STREAMINFO MD5 decodes (CRCs pass) but reports md5_ok = false") {
    val samples = Array.tabulate(150)(i => Multimodal.flacSample(3L, i))
    val enc = encode(samples, 16000)
    val bad = enc.clone()
    bad(4 + 4 + 18) = (bad(4 + 4 + 18) ^ 0xff).toByte // inside the MD5 field
    val d = decode(bad)
    assert(d.isDefined && !d.get.md5Ok && d.get.samples.sameElements(samples))
  }

  // ---- decode-only subset paths (hand-built streams) ------------------

  /** Wrap hand-built frame bytes in a minimal fLaC + STREAMINFO stream. */
  private def wrap(n: Int, rate: Int, samples: Array[Int], frame: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new BitWriter
    si.writeBits(n, 16); si.writeBits(n, 16); si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(rate, 20); si.writeBits(0, 3); si.writeBits(15, 5); si.writeBits(n, 36)
    out.write(si.bytesSoFar, 0, 18)
    out.write(pcmMd5(samples), 0, 16)
    out.write(frame, 0, frame.length)
    out.toByteArray
  }

  private def frameHeader(bw: BitWriter, n: Int, rate: Int): Unit = {
    bw.writeBits(0x3ffe, 14); bw.writeBits(0, 1); bw.writeBits(0, 1)
    bw.writeBits(0x7, 4); bw.writeBits(0xd, 4)
    bw.writeBits(0, 4); bw.writeBits(4, 3); bw.writeBits(0, 1)
    bw.writeBits(0, 8); bw.writeBits(n - 1, 16); bw.writeBits(rate, 16)
    bw.writeBits(crc8(bw.bytesSoFar, 0, 9), 8)
  }

  private def finishFrame(bw: BitWriter): Array[Byte] = {
    bw.alignByte()
    val body = bw.bytesSoFar
    bw.writeBits(crc16(body, 0, body.length), 16)
    bw.bytesSoFar
  }

  test("decode-only: VERBATIM subframe") {
    val samples = Array(5, -7, 32767, -32768, 0, 1234)
    val bw = new BitWriter
    frameHeader(bw, samples.length, 8000)
    bw.writeBits(0, 1); bw.writeBits(1, 6); bw.writeBits(0, 1) // VERBATIM
    samples.foreach(s => bw.writeBits(s.toLong & 0xffffL, 16))
    val d = decode(wrap(samples.length, 8000, samples, finishFrame(bw)))
    assert(d.get.samples.sameElements(samples) && d.get.md5Ok)
  }

  test("decode-only: rice escape partition (verbatim residuals at explicit width)") {
    val samples = Array(10, 11, 13, 12, 14, 15, 13, 16) // order-1 residuals small
    val res = fixedResiduals(samples, 1)
    val bw = new BitWriter
    frameHeader(bw, samples.length, 8000)
    bw.writeBits(0, 1); bw.writeBits(8L | 1L, 6); bw.writeBits(0, 1) // FIXED order 1
    bw.writeBits(samples(0).toLong & 0xffffL, 16)                    // warm-up
    bw.writeBits(0, 2); bw.writeBits(0, 4)                           // rice4, po=0
    bw.writeBits(15, 4)                                              // ESCAPE
    bw.writeBits(6, 5)                                               // 6-bit raw residuals
    res.foreach(r => bw.writeBits(r & 0x3fL, 6))
    val d = decode(wrap(samples.length, 8000, samples, finishFrame(bw)))
    assert(d.get.samples.sameElements(samples) && d.get.md5Ok)
  }

  test("decode-only: two rice partitions (order 1, po=1) and 5-bit params") {
    val samples = Array.tabulate(8)(i => i * 3) // order-1 residuals: 3s after warm-up
    val res = fixedResiduals(samples, 1)
    val bw = new BitWriter
    frameHeader(bw, samples.length, 8000)
    bw.writeBits(0, 1); bw.writeBits(8L | 1L, 6); bw.writeBits(0, 1)
    bw.writeBits(samples(0).toLong & 0xffffL, 16)
    bw.writeBits(1, 2)           // rice2: 5-bit params
    bw.writeBits(1, 4)           // partition order 1 -> two partitions of n/2
    val (p0, p1) = res.splitAt(samples.length / 2 - 1) // first partition minus warm-up
    for ((part, param) <- Seq((p0, 2), (p1, 3))) {
      bw.writeBits(param, 5)
      part.foreach { r =>
        val u = if (r < 0) (-r << 1) - 1 else r << 1
        bw.writeUnary((u >>> param).toInt)
        bw.writeBits(u & ((1L << param) - 1L), param)
      }
    }
    val d = decode(wrap(samples.length, 8000, samples, finishFrame(bw)))
    assert(d.get.samples.sameElements(samples) && d.get.md5Ok)
  }

  test("multi-frame: blockSize splits into sequential UTF-8-numbered frames, bit-exact") {
    val rnd = new scala.util.Random(21)
    val samples = Array.tabulate(1000)(_ => rnd.nextInt(4000) - 2000)
    val enc = encode(samples, 22050, blockSize = 192) // 6 frames, last short
    val d = decode(enc).get
    assert(d.samples.sameElements(samples) && d.md5Ok && d.sampleRate == 22050)
    // single-frame and multi-frame encodes decode to the same PCM
    val one = decode(encode(samples, 22050)).get
    assert(one.samples.sameElements(d.samples))
    // a frame-boundary corruption (mid-stream frame header) must fail
    val bad = enc.clone()
    val midFrame = enc.length / 2
    bad(midFrame) = (bad(midFrame) ^ 0x40).toByte
    assert(decode(bad).isEmpty)
    // swapping two frames breaks the sequential frame numbering even
    // where lengths agree — deletion of a full trailing frame breaks
    // the STREAMINFO total-samples check
    assert(decode(enc.take(enc.length - 3)).isEmpty)
  }

  test("utf8 frame numbers: multi-byte varints round-trip (many short frames)") {
    // 300 frames of 2 samples: frame indices cross the 0x80 varint
    // boundary, so 2-byte coded numbers are exercised and validated
    val samples = Array.tabulate(600)(i => (i % 64) - 32)
    val enc = encode(samples, 8000, blockSize = 2)
    val d = decode(enc).get
    assert(d.samples.sameElements(samples) && d.md5Ok)
  }

  test("decode-only: reserved subframe types are clean subset boundaries (None, no throw)") {
    val samples = Array(1, 2, 3, 4)
    // reserved type 0b000010 — must reject without reading garbage
    val bw = new BitWriter
    frameHeader(bw, samples.length, 8000)
    bw.writeBits(0, 1); bw.writeBits(2, 6); bw.writeBits(0, 1)
    bw.writeBits(0, 32)
    assert(decode(wrap(samples.length, 8000, samples, finishFrame(bw))).isEmpty)
  }

  test("LPC: a fast two-tone signal picks the LPC subframe, beats FIXED, round-trips bit-exact") {
    // fast tones (ω > π/3) are where LPC earns its keep: the k-th
    // difference AMPLIFIES them ((2·sin(ω/2))^k > 1), so every FIXED
    // order sees big residuals while a 4-pole predictor models both
    // tones almost exactly
    val samples = Array.tabulate(512)(i =>
      (8000 * math.sin(i * 1.8) + 3000 * math.sin(i * 2.4)).toInt)
    val enc = encode(samples, 16000)
    val d = decode(enc).get
    assert(d.samples.sameElements(samples) && d.md5Ok)
    // subframe header byte sits right after the 10-byte frame header
    // (frame 0 → 1-byte varint): pad(1) type(6) wasted(1)
    val typ = (enc(4 + 4 + 34 + 10) >> 1) & 0x3f
    assert((typ & 0x20) == 0x20, f"expected an LPC subframe, got type 0x$typ%02x")
    // the 12-bit quantized 4-pole fit leaves ~quantization-noise
    // residuals (~10 bits/sample ≈ 640 bytes); every FIXED order sees
    // amplified residuals (~16 bits/sample ≈ 1 KB+) — well separated
    assert(enc.length < 800, s"LPC should clearly beat FIXED's ~1 KB here, got ${enc.length}")
  }

  test("partitioned rice isolates segment wraps: the ramp shrinks well below its po=0 size") {
    val samples = Array.tabulate(400)(i => Multimodal.flacSample(7L, i))
    val enc = encode(samples, 16000)
    // po=0 exact-best single-partition encoding measured 422 bytes; the
    // partition plan must cut the wrap cost decisively
    assert(enc.length < 300, s"partitioned rice should beat 422-byte po=0, got ${enc.length}")
    assert(decode(enc).get.samples.sameElements(samples))
  }
}
