package graft.multimodal

import java.security.MessageDigest

/** Hand-rolled FLAC-subset codec (the public FLAC format, RFC 9639 /
  * xiph.org spec) — the compressed-AUDIO sibling of JpegCodec: real
  * entropy machinery (rice/Golomb residual coding), real prediction
  * (the five FIXED polynomial predictors), real integrity chains
  * (header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, stream MD5 of
  * the raw PCM), all bit-packed by hand. No codec library exists in
  * this container for FLAC (ImageIO has no audio analogue), so the
  * validation story is: (a) encode→decode round-trips are pinned
  * bit-exact against closed-form sample generators (any bitstream or
  * predictor bug breaks the integer stats the oracle predicts), (b)
  * golden bit-level vectors for rice words and both CRCs straight from
  * the spec's definitions, (c) the decoder verifies every embedded
  * integrity field (sync, CRC-8, CRC-16, MD5) and returns None on any
  * violation — the hostile-bytes contract shared with the image
  * decoders.
  *
  * Encoder scope (a strict, honest subset that real decoders accept):
  * mono or stereo, 16-bit, fixed blocking, subframe type CONSTANT /
  * best-FIXED-order-0-4 / order-8 quantized LPC (chosen by exact
  * bit-cost), exact-cost-optimal rice partition plans, and per-frame
  * exact-cost stereo decorrelation (independent vs left/side vs
  * right/side vs mid/side). Decoder scope is wider: any blocksize/
  * sample-rate/bps code, CONSTANT / VERBATIM / FIXED / LPC subframes,
  * all four stereo channel assignments, multi-partition rice with
  * both 4- and 5-bit parameters and the verbatim-escape, wasted-bits
  * shifts — ≥3 channels return None (documented subset boundary).
  */
object FlacCodec {

  // ---- bit plumbing ----------------------------------------------------

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** FLAC unary: q zero bits terminated by a one bit. */
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nbits != 0) writeBit(0)
    def isAligned: Boolean = nbits == 0
    /** Whole bytes emitted so far (call only when byte-aligned). */
    def bytesSoFar: Array[Byte] = { require(isAligned); out.toByteArray }
  }

  private object Eof extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def bitPos: Int = pos
    def bytePos: Int = pos >> 3
    def isAligned: Boolean = (pos & 7) == 0
    def readBit(): Int = {
      if ((pos >> 3) >= b.length) throw Eof
      val r = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; r
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) { q += 1; if (q > (b.length << 3)) throw Eof }
      q
    }
    def alignByte(): Unit = while (!isAligned) { val _ = readBit() }
  }

  // ---- integrity: the two FLAC CRCs + the stream MD5 -------------------

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the frame-header CRC. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the frame CRC. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MD5 of the raw little-endian signed-16 PCM — STREAMINFO's digest. */
  def pcmMd5(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    MessageDigest.getInstance("MD5").digest(pcm)
  }

  // ---- fixed predictors ------------------------------------------------

  /** Residuals of FIXED order k (the polynomial predictor difference
    * cascade): order 0 = x, 1 = Δx, 2 = Δ²x, … — computed directly
    * from the binomial form so each order is independent.
    */
  def fixedResiduals(x: Array[Int], order: Int): Array[Long] = {
    val coef: Array[Array[Long]] = Array(
      Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L), Array(4L, -6L, 4L, -1L))
    val c = coef(order)
    val out = new Array[Long](x.length - order)
    var i = order
    while (i < x.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += c(j) * x(i - 1 - j); j += 1 }
      out(i - order) = x(i).toLong - pred
      i += 1
    }
    out
  }

  private def zigzag(r: Long): Long = if (r < 0) (-r << 1) - 1 else r << 1
  private def unzigzag(u: Long): Long = if ((u & 1L) == 1L) -((u + 1L) >> 1) else u >> 1

  /** Exact rice bit cost of a residual block at parameter p. */
  def riceCost(us: Array[Long], p: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < us.length) { bits += (us(i) >>> p) + 1L + p; i += 1 }
    bits
  }

  /** The exact-cost-minimal rice parameter in [0, 14] (15 = escape,
    * never needed for 16-bit fixed residuals at these orders).
    */
  def bestRiceParam(us: Array[Long]): Int = {
    var best = 0
    var bestCost = riceCost(us, 0)
    var p = 1
    while (p <= 14) {
      val c = riceCost(us, p)
      if (c < bestCost) { bestCost = c; best = p }
      p += 1
    }
    best
  }

  /** Exact-cost-optimal rice PARTITION plan for a residual block:
    * tries partition orders 0..4 (where 2^po divides the blocksize and
    * the first partition keeps ≥ 1 residual), picks the exact-best
    * parameter per partition, and returns (po, params, totalBits).
    * Partitioning is what rescues mixed distributions — a stream of
    * near-zero residuals with rare huge ones (segment wraps) pays for
    * the worst value across the whole block at po=0, but isolates it
    * into one partition at po>0.
    */
  def bestRicePlan(us: Array[Long], order: Int, n: Int): (Int, Array[Int], Long) = {
    // Rice cost is ADDITIVE over residuals and the dyadic partition
    // boundaries NEST (a po-k partition is exactly two po-(k+1)
    // partitions, warmup offset included), so ONE O(15n) pass builds a
    // per-slice × per-param cost table at the FINEST feasible order
    // and every coarser po is evaluated by summing integer partials —
    // bit-identical to costing each po independently (the form this
    // replaces, golden-pinned) at a fifth of the arithmetic.
    val feasible = (0 to 4).filter(po => ((n >> po) << po) == n && (n >> po) > order)
    val poMax = feasible.max
    val slices = 1 << poMax
    val table = Array.ofDim[Long](slices, 15)
    var w = 0
    var s = 0
    while (s < slices) {
      val count = (n >> poMax) - (if (s == 0) order else 0)
      val row = table(s)
      var i = 0
      while (i < count) {
        val u = us(w + i)
        var p = 0
        while (p <= 14) { row(p) += (u >>> p) + 1L + p; p += 1 }
        i += 1
      }
      w += count
      s += 1
    }
    var bestPo = 0
    var bestParams: Array[Int] = null
    var bestBits = Long.MaxValue
    // ascending po + strict < keeps the lowest-po tie-break; within a
    // partition, strict < keeps the lowest param on cost ties — both
    // exactly as the per-po form decided
    feasible.foreach { po =>
      val parts = 1 << po
      val group = slices / parts
      val params = new Array[Int](parts)
      var bits = 4L + 2L + 4L * parts // partition order + method + param fields
      var p = 0
      while (p < parts) {
        var bestParam = 0
        var bestCost = Long.MaxValue
        var q = 0
        while (q <= 14) {
          var c = 0L
          var g = p * group
          while (g < (p + 1) * group) { c += table(g)(q); g += 1 }
          if (c < bestCost) { bestCost = c; bestParam = q }
          q += 1
        }
        params(p) = bestParam
        bits += bestCost
        p += 1
      }
      if (bits < bestBits) { bestBits = bits; bestPo = po; bestParams = params }
    }
    (bestPo, bestParams, bestBits)
  }

  // ---- LPC analysis ----------------------------------------------------

  /** Levinson-Durbin LPC coefficients (pred x[i] ≈ Σ c_j·x[i−j]) from
    * the frame's autocorrelation; null when the signal is degenerate
    * (silence / unstable recursion) — caller falls back to FIXED.
    */
  def lpcCoefficients(x: Array[Int], order: Int): Array[Double] = {
    val n = x.length
    if (n <= order) return null
    val r = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += x(i).toDouble * x(i - lag).toDouble; i += 1 }
      r(lag) = s
      lag += 1
    }
    if (r(0) == 0.0) return null
    val a = new Array[Double](order + 1)
    var err = r(0)
    var m = 1
    while (m <= order) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      if (err <= 0.0) return null
      val k = acc / err
      val prev = a.clone()
      a(m) = k
      j = 1
      while (j < m) { a(j) = prev(j) - k * prev(m - j); j += 1 }
      err *= (1.0 - k * k)
      m += 1
    }
    java.util.Arrays.copyOfRange(a, 1, order + 1)
  }

  /** Quantize LPC coefficients to `precision`-bit signed integers with
    * a shared left-shift; error-feedback rounding (libFLAC's scheme).
    * Returns (qcoeffs, shift) or null when degenerate.
    */
  def quantizeLpc(coefs: Array[Double], precision: Int): (Array[Int], Int) = {
    val cmax = coefs.map(math.abs).max
    if (cmax <= 0.0 || !java.lang.Double.isFinite(cmax)) return null
    val headroom = (math.log(cmax) / math.log(2.0)).floor.toInt + 1
    var shift = precision - 1 - headroom
    if (shift > 15) shift = 15
    if (shift < 0) return null // coefficient magnitudes out of subset range
    val lim = (1 << (precision - 1)) - 1
    val q = new Array[Int](coefs.length)
    var e = 0.0
    var j = 0
    while (j < coefs.length) {
      val target = coefs(j) * (1L << shift).toDouble + e
      var v = math.round(target).toInt
      if (v > lim) v = lim
      if (v < -lim - 1) v = -lim - 1
      e = target - v
      q(j) = v
      j += 1
    }
    (q, shift)
  }

  /** LPC residuals with the integer predictor the decoder replays:
    * res[i] = x[i] − ((Σ q_j·x[i−1−j]) >> shift) — exact by
    * construction, so LPC frames are lossless regardless of how crude
    * the coefficient fit is.
    */
  def lpcResiduals(x: Array[Int], q: Array[Int], shift: Int): Array[Long] = {
    val order = q.length
    val out = new Array[Long](x.length - order)
    var i = order
    while (i < x.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += q(j).toLong * x(i - 1 - j).toLong; j += 1 }
      out(i - order) = x(i).toLong - (pred >> shift)
      i += 1
    }
    out
  }

  // ---- encoder ---------------------------------------------------------

  /** UTF-8-style coded number (the frame-number varint): 1-6 bytes.
    * Exposed for the spec's hand-built streams.
    */
  def writeUtf8Num(bw: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 31))
    val len =
      if (v < 0x80L) 1 else if (v < 0x800L) 2 else if (v < 0x10000L) 3
      else if (v < 0x200000L) 4 else if (v < 0x4000000L) 5 else 6
    if (len == 1) bw.writeBits(v, 8)
    else {
      val heads = Array(0x00, 0xc0, 0xe0, 0xf0, 0xf8, 0xfc)
      bw.writeBits((heads(len - 1) | (v >>> (6 * (len - 1))).toInt).toLong, 8)
      var i = len - 2
      while (i >= 0) { bw.writeBits(0x80L | ((v >>> (6 * i)) & 0x3fL), 8); i -= 1 }
    }
  }

  /** Encode mono 16-bit samples as a fixed-blocking FLAC stream:
    * fLaC marker, STREAMINFO (with the real PCM MD5), then one frame
    * per `blockSize` samples (the last frame shorter) — each with a
    * UTF-8-coded frame number, a CONSTANT or best-FIXED-order
    * subframe, and one exact-parameter rice partition.
    */
  def encode(samples: Array[Int], sampleRate: Int, blockSize: Int = 4096): Array[Byte] = {
    val n = samples.length
    require(n >= 1, "flac: empty input")
    require(blockSize >= 1 && blockSize <= 65535, s"flac: blocksize $blockSize out of range")
    require(samples.forall(s => s >= -32768 && s <= 32767), "flac: 16-bit samples only")
    require(sampleRate >= 1 && sampleRate <= 65535, s"flac: rate $sampleRate out of 16-bit-code range")

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO: last-block flag + type 0, 24-bit length 34
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val lastSize = if (n % blockSize == 0) blockSize else n % blockSize
    val maxBs = math.min(blockSize, n)
    val minBs = if (n <= blockSize) n else math.min(blockSize, lastSize)
    val si = new BitWriter
    si.writeBits(minBs, 16)
    si.writeBits(maxBs, 16)
    si.writeBits(0, 24)          // min framesize (unknown)
    si.writeBits(0, 24)          // max framesize (unknown)
    si.writeBits(sampleRate, 20)
    si.writeBits(0, 3)           // channels - 1
    si.writeBits(15, 5)          // bps - 1 = 15
    si.writeBits(n, 36)          // total samples
    val siBytes = si.bytesSoFar
    out.write(siBytes, 0, siBytes.length)
    out.write(pcmMd5(samples), 0, 16)

    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val len = math.min(blockSize, n - off)
      val frame = encodeFrame(java.util.Arrays.copyOfRange(samples, off, off + len),
        sampleRate, frameIdx)
      out.write(frame, 0, frame.length)
      off += len
      frameIdx += 1
    }
    out.toByteArray
  }

  /** An exact-bit-cost subframe plan for one channel: total bits
    * (including the 8-bit subframe header — absolute, so plans at
    * different effective bit widths are comparable across stereo
    * channel assignments) plus the writer that emits it.
    */
  private final case class SubPlan(bits: Long, write: BitWriter => Unit)

  /** Plan the exact-smallest subframe for `samples` at `eb` effective
    * bits (16 for plain channels, 17 for a stereo side channel):
    * CONSTANT if flat, else the best of FIXED 0-4 and an order-8
    * quantized LPC fit, each under its exact-cost-optimal rice
    * partition plan. Mono encode() delegates here — the emitted bits
    * are identical to the pre-stereo encoder (golden-pinned).
    */
  private def planSubframe(samples: Array[Int], eb: Int): SubPlan = {
    val n = samples.length
    val mask = (1L << eb) - 1L
    val allEqual = samples.forall(_ == samples(0))
    if (allEqual) {
      SubPlan(8L + eb, { bw =>
        bw.writeBits(0, 1)       // pad
        bw.writeBits(0, 6)       // type CONSTANT
        bw.writeBits(0, 1)       // no wasted bits
        bw.writeBits(samples(0).toLong & mask, eb)
      })
    } else {
      final case class Cand(typ: Long, order: Int, lpc: Option[(Array[Int], Int)],
          res: Array[Long], po: Int, params: Array[Int], bits: Long)
      val LpcOrder = 8
      val LpcPrecision = 12
      val fixedCands = (0 to math.min(4, n - 1)).map { ord =>
        val res = fixedResiduals(samples, ord)
        val (po, params, bits) = bestRicePlan(res.map(zigzag), ord, n)
        Cand(8L | ord, ord, None, res, po, params, bits + eb.toLong * ord)
      }
      val lpcCand =
        if (n <= LpcOrder + 1) None
        else Option(lpcCoefficients(samples, LpcOrder))
          .flatMap(c => Option(quantizeLpc(c, LpcPrecision)))
          .map { case (q, shift) =>
            val res = lpcResiduals(samples, q, shift)
            val (po, params, bits) = bestRicePlan(res.map(zigzag), LpcOrder, n)
            Cand(0x20L | (LpcOrder - 1), LpcOrder, Some((q, shift)), res, po, params,
              bits + eb.toLong * LpcOrder + 4L + 5L + LpcPrecision.toLong * LpcOrder)
          }
      val best = (fixedCands ++ lpcCand).minBy(_.bits)
      SubPlan(8L + best.bits, { bw =>
        bw.writeBits(0, 1)               // pad
        bw.writeBits(best.typ, 6)        // type FIXED|order or LPC|order-1
        bw.writeBits(0, 1)               // no wasted bits
        var i = 0
        while (i < best.order) { bw.writeBits(samples(i).toLong & mask, eb); i += 1 }
        best.lpc.foreach { case (q, shift) =>
          bw.writeBits(LpcPrecision - 1, 4)
          bw.writeBits(shift, 5)
          q.foreach(c => bw.writeBits(c.toLong & ((1L << LpcPrecision) - 1L), LpcPrecision))
        }
        bw.writeBits(0, 2)               // residual method: 4-bit rice
        bw.writeBits(best.po, 4)
        var w = 0
        var p = 0
        while (p < (1 << best.po)) {
          val count = (n >> best.po) - (if (p == 0) best.order else 0)
          val param = best.params(p)
          bw.writeBits(param, 4)
          var k = 0
          while (k < count) {
            val u = zigzag(best.res(w))
            bw.writeUnary((u >>> param).toInt)
            bw.writeBits(u & ((1L << param) - 1L), param)
            w += 1; k += 1
          }
          p += 1
        }
      })
    }
  }

  /** Frame header shared by mono and stereo frames; returns after the
    * CRC-8 so the caller appends subframes.
    */
  private def writeFrameHeader(bw: BitWriter, n: Int, sampleRate: Int,
      frameIdx: Long, chanAsgn: Long): Unit = {
    bw.writeBits(0x3ffe, 14)     // sync
    bw.writeBits(0, 1)           // reserved
    bw.writeBits(0, 1)           // fixed blocking
    bw.writeBits(0x7, 4)         // blocksize: 16 bits at end, minus 1
    bw.writeBits(0xd, 4)         // sample rate: 16 bits in Hz at end
    bw.writeBits(chanAsgn, 4)    // 0 mono; 1 indep stereo; 8/9/10 L-S/R-S/M-S
    bw.writeBits(4, 3)           // sample size: 16 bits
    bw.writeBits(0, 1)           // reserved
    writeUtf8Num(bw, frameIdx)   // coded frame number
    bw.writeBits(n - 1, 16)
    bw.writeBits(sampleRate, 16)
    val hdr = bw.bytesSoFar
    bw.writeBits(crc8(hdr, 0, hdr.length), 8)
  }

  private def encodeFrame(samples: Array[Int], sampleRate: Int, frameIdx: Long): Array[Byte] = {
    val bw = new BitWriter
    writeFrameHeader(bw, samples.length, sampleRate, frameIdx, chanAsgn = 0L)
    planSubframe(samples, 16).write(bw)
    bw.alignByte()
    val body = bw.bytesSoFar
    bw.writeBits(crc16(body, 0, body.length), 16)
    bw.bytesSoFar
  }

  /** One stereo frame under the exact-smallest of the four channel
    * assignments (independent, left/side, right/side, mid/side) — the
    * decorrelation decision real encoders make per frame, here by
    * exact bit cost of the fully-planned subframe pairs. The side
    * channel (L−R) carries 17 effective bits per the spec; mid is the
    * floored average whose dropped bit rides in side's parity.
    */
  private def encodeStereoFrame(l: Array[Int], r: Array[Int], sampleRate: Int,
      frameIdx: Long): Array[Byte] = {
    val n = l.length
    val mid = Array.tabulate(n)(i => (l(i) + r(i)) >> 1)
    val side = Array.tabulate(n)(i => l(i) - r(i))
    val pL = planSubframe(l, 16)
    val pR = planSubframe(r, 16)
    val pM = planSubframe(mid, 16)
    val pS = planSubframe(side, 17)
    val options: Seq[(Long, Seq[SubPlan])] = Seq(
      (1L, Seq(pL, pR)),   // independent
      (8L, Seq(pL, pS)),   // left/side
      (9L, Seq(pS, pR)),   // right/side
      (10L, Seq(pM, pS)))  // mid/side
    val (asgn, subs) = options.minBy { case (_, ps) => ps.map(_.bits).sum }
    val bw = new BitWriter
    writeFrameHeader(bw, n, sampleRate, frameIdx, asgn)
    subs.foreach(_.write(bw))
    bw.alignByte()
    val body = bw.bytesSoFar
    bw.writeBits(crc16(body, 0, body.length), 16)
    bw.bytesSoFar
  }

  /** Encode a stereo 16-bit pair of equal-length channels as a
    * fixed-blocking FLAC stream with per-frame exact-cost channel
    * decorrelation. STREAMINFO's MD5 covers the interleaved PCM
    * (L₀R₀L₁R₁…), matching what decode() returns and verifies.
    */
  def encodeStereo(left: Array[Int], right: Array[Int], sampleRate: Int,
      blockSize: Int = 4096): Array[Byte] = {
    val n = left.length
    require(n >= 1 && right.length == n, "flac: stereo channels must align, non-empty")
    require(blockSize >= 1 && blockSize <= 65535, s"flac: blocksize $blockSize out of range")
    require(left.forall(s => s >= -32768 && s <= 32767) &&
      right.forall(s => s >= -32768 && s <= 32767), "flac: 16-bit samples only")
    require(sampleRate >= 1 && sampleRate <= 65535, s"flac: rate $sampleRate out of 16-bit-code range")
    val interleaved = new Array[Int](2 * n)
    var i = 0
    while (i < n) {
      interleaved(2 * i) = left(i); interleaved(2 * i + 1) = right(i); i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val lastSize = if (n % blockSize == 0) blockSize else n % blockSize
    val maxBs = math.min(blockSize, n)
    val minBs = if (n <= blockSize) n else math.min(blockSize, lastSize)
    val si = new BitWriter
    si.writeBits(minBs, 16)
    si.writeBits(maxBs, 16)
    si.writeBits(0, 24)
    si.writeBits(0, 24)
    si.writeBits(sampleRate, 20)
    si.writeBits(1, 3)           // channels - 1 = 1
    si.writeBits(15, 5)          // bps - 1 = 15
    si.writeBits(n, 36)          // total INTER-channel samples (per spec)
    val siBytes = si.bytesSoFar
    out.write(siBytes, 0, siBytes.length)
    out.write(pcmMd5(interleaved), 0, 16)
    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val len = math.min(blockSize, n - off)
      val frame = encodeStereoFrame(
        java.util.Arrays.copyOfRange(left, off, off + len),
        java.util.Arrays.copyOfRange(right, off, off + len),
        sampleRate, frameIdx)
      out.write(frame, 0, frame.length)
      off += len
      frameIdx += 1
    }
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  /** Decoded stream: rate/channels/bps from the frame, the samples,
    * and whether the STREAMINFO MD5 matched the decoded PCM.
    */
  final case class Decoded(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int], md5Ok: Boolean)

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -2, -3,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768) // -2/-3: 8/16 bits at end
  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000, 22050,
    24000, 32000, 44100, 48000, 96000, -2, -3, -4, -1) // -2/-3/-4: coded at end
  private val SampleSizes = Array(-1, 8, 12, 0, 16, 20, 24, 32)

  /** Strict subset decode: None on anything malformed, unsupported
    * (≥3 channels), truncated, or failing an integrity check. Stereo
    * output is interleaved L₀R₀L₁R₁… (the MD5's sample order).
    */
  def decode(b: Array[Byte]): Option[Decoded] =
    try decodeOrThrow(b) catch { case Eof | _: IllegalArgumentException => None }

  private def fail(): Nothing = throw new IllegalArgumentException("flac: malformed")

  private def decodeOrThrow(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 4 + 4 + 34 || bytes(0) != 'f' || bytes(1) != 'L' ||
      bytes(2) != 'a' || bytes(3) != 'C') return None
    var o = 4
    // metadata blocks: STREAMINFO must come first; skip the rest
    var siRate = -1; var siChannels = -1; var siBps = -1
    var siTotal = 0L
    var siMd5: Array[Byte] = null
    var last = false
    var first = true
    while (!last) {
      if (o + 4 > bytes.length) return None
      val hdr = bytes(o) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      o += 4
      if (o + len > bytes.length) return None
      if (first) {
        if (typ != 0 || len != 34) return None
        val r = new BitReader(java.util.Arrays.copyOfRange(bytes, o, o + 34))
        val _ = r.readBits(32)          // min/max blocksize
        val _2 = r.readBits(48)         // min/max framesize
        siRate = r.readBits(20).toInt
        siChannels = r.readBits(3).toInt + 1
        siBps = r.readBits(5).toInt + 1
        siTotal = r.readBits(36)
        siMd5 = java.util.Arrays.copyOfRange(bytes, o + 18, o + 34)
      }
      first = false
      o += len
    }
    if (siChannels < 1 || siChannels > 2) return None // subset: mono + stereo
    // frames: fixed blocking, sequential UTF-8-coded frame numbers,
    // each CRC-checked independently — loop until the bytes run out
    val fr = new BitReader(java.util.Arrays.copyOfRange(bytes, o, bytes.length))
    val total = bytes.length - o
    val all = scala.collection.mutable.ArrayBuilder.make[Int]
    var nTotal = 0L
    var rate = -1
    var bps = -1
    var frameIdx = 0L
    while (fr.bytePos < total) {
      val frameStart = fr.bytePos
      if (!fr.isAligned) fail()
      if (fr.readBits(14) != 0x3ffe) fail()
      if (fr.readBit() != 0) fail()
      val _blocking = fr.readBit()
      val bsCode = fr.readBits(4).toInt
      val srCode = fr.readBits(4).toInt
      val chanAsgn = fr.readBits(4).toInt
      // mono streams must say mono; stereo streams one of the four
      // stereo assignments (independent or a decorrelated pair)
      if (siChannels == 1 && chanAsgn != 0) fail()
      if (siChannels == 2 && chanAsgn != 1 && (chanAsgn < 8 || chanAsgn > 10)) fail()
      val ssCode = fr.readBits(3).toInt
      if (fr.readBit() != 0) fail()
      // coded number: UTF-8-style varint carrying the frame index
      val b0 = fr.readBits(8).toInt
      val extra = if (b0 < 0x80) 0 else {
        var k = 0; var m = b0
        while ((m & 0x40) != 0) { k += 1; m <<= 1 }
        if ((b0 & 0xc0) == 0x80 || k < 1 || k > 6) fail()
        k
      }
      var coded = if (extra == 0) b0.toLong else (b0 & ((1 << (6 - extra)) - 1)).toLong
      var e = 0
      while (e < extra) {
        val cb = fr.readBits(8).toInt
        if ((cb & 0xc0) != 0x80) fail()
        coded = (coded << 6) | (cb & 0x3f).toLong
        e += 1
      }
      if (coded != frameIdx) fail()     // fixed blocking: sequential frames
      val blockSize = bsCode match {
        case 0 => fail()
        case 6 => fr.readBits(8).toInt + 1
        case 7 => fr.readBits(16).toInt + 1
        case c => BlockSizes(c)
      }
      val frate = srCode match {
        case 12 => fr.readBits(8).toInt * 1000
        case 13 => fr.readBits(16).toInt
        case 14 => fr.readBits(16).toInt * 10
        case 15 => fail()
        case 0  => siRate
        case c  => SampleRates(c)
      }
      val fbps = ssCode match {
        case 0 => siBps
        case 3 => fail()
        case c => SampleSizes(c)
      }
      if (blockSize < 1 || fbps < 4 || fbps > 32) fail()
      if (rate >= 0 && (frate != rate || fbps != bps)) fail() // stream-constant
      rate = frate; bps = fbps
      // CRC-8 over the header bytes (reader is byte-aligned here)
      if (!fr.isAligned) fail()
      if (crc8(bytes, o + frameStart, o + fr.bytePos) != fr.readBits(8).toInt) fail()

      if (siChannels == 1) {
        all ++= readSubframe(fr, blockSize, fbps)
      } else {
        // stereo: two subframes; a side channel carries bps+1
        // effective bits (the L−R range), per the spec's assignment
        // table. Reconstruct L/R and interleave (L₀R₀L₁R₁…) — the
        // order the stream MD5 is defined over.
        val eb0 = fbps + (if (chanAsgn == 9) 1 else 0)
        val eb1 = fbps + (if (chanAsgn == 8 || chanAsgn == 10) 1 else 0)
        val c0 = readSubframe(fr, blockSize, eb0)
        val c1 = readSubframe(fr, blockSize, eb1)
        var i = 0
        while (i < blockSize) {
          var lv = 0L; var rv = 0L
          chanAsgn match {
            case 1 =>  lv = c0(i); rv = c1(i)
            case 8 =>  lv = c0(i); rv = c0(i).toLong - c1(i)       // left/side
            case 9 =>  rv = c1(i); lv = c1(i).toLong + c0(i)       // right/side
            case _ =>                                              // mid/side
              val s = c1(i).toLong
              val sum = (c0(i).toLong << 1) | (s & 1L)
              lv = (sum + s) >> 1; rv = (sum - s) >> 1
          }
          if (lv < Int.MinValue || lv > Int.MaxValue ||
            rv < Int.MinValue || rv > Int.MaxValue) fail()
          all += lv.toInt; all += rv.toInt
          i += 1
        }
      }

      fr.alignByte()
      if (crc16(bytes, o + frameStart, o + fr.bytePos) != fr.readBits(16).toInt) fail()
      nTotal += blockSize.toLong
      frameIdx += 1
    }
    if (frameIdx == 0L) fail()
    if (siTotal != 0L && siTotal != nTotal) fail()
    val decoded = all.result()
    val md5Ok = siMd5 != null && siMd5.exists(_ != 0) && bps == 16 &&
      java.util.Arrays.equals(pcmMd5(decoded), siMd5)
    Some(Decoded(rate, siChannels, bps, decoded, md5Ok))
  }

  private def readSubframe(fr: BitReader, n: Int, bps: Int): Array[Int] = {
    if (fr.readBit() != 0) fail()
    val typ = fr.readBits(6).toInt
    val wastedFlag = fr.readBit()
    val wasted = if (wastedFlag == 1) fr.readUnary() + 1 else 0
    val eb = bps - wasted
    if (eb < 1) fail()
    val x = new Array[Int](n)
    if (typ == 0) {                       // CONSTANT
      val v = fr.readSigned(eb)
      java.util.Arrays.fill(x, v)
    } else if (typ == 1) {                // VERBATIM
      var i = 0
      while (i < n) { x(i) = fr.readSigned(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      if (order > n) fail()
      var i = 0
      while (i < order) { x(i) = fr.readSigned(eb); i += 1 }
      val res = readResiduals(fr, n, order)
      val coef: Array[Array[Long]] = Array(
        Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L), Array(4L, -6L, 4L, -1L))
      val c = coef(order)
      i = order
      while (i < n) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += c(j) * x(i - 1 - j); j += 1 }
        val v = pred + res(i - order)
        if (v < Int.MinValue || v > Int.MaxValue) fail()
        x(i) = v.toInt
        i += 1
      }
    } else if ((typ & 0x20) == 0x20) {    // LPC, order = low 5 bits + 1
      val order = (typ & 0x1f) + 1
      if (order > n) fail()
      var i = 0
      while (i < order) { x(i) = fr.readSigned(eb); i += 1 }
      val precM1 = fr.readBits(4).toInt
      if (precM1 == 15) fail()            // invalid per spec
      val precision = precM1 + 1
      val shift = fr.readSigned(5)
      if (shift < 0) fail()               // negative shift: subset boundary
      val q = new Array[Int](order)
      i = 0
      while (i < order) { q(i) = fr.readSigned(precision); i += 1 }
      val res = readResiduals(fr, n, order)
      i = order
      while (i < n) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += q(j).toLong * x(i - 1 - j).toLong; j += 1 }
        val v = (pred >> shift) + res(i - order)
        if (v < Int.MinValue || v > Int.MaxValue) fail()
        x(i) = v.toInt
        i += 1
      }
    } else fail()                         // reserved: subset boundary
    if (wasted > 0) {
      var i = 0
      while (i < n) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  private def readResiduals(fr: BitReader, n: Int, order: Int): Array[Long] = {
    val method = fr.readBits(2).toInt
    if (method > 1) fail()
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = fr.readBits(4).toInt
    val partitions = 1 << po
    if ((n >> po) << po != n) fail()
    val out = new Array[Long](n - order)
    var w = 0
    var p = 0
    while (p < partitions) {
      val count = (n >> po) - (if (p == 0) order else 0)
      if (count < 0) fail()
      val param = fr.readBits(paramBits).toInt
      if (param == escape) {
        val rawBits = fr.readBits(5).toInt
        var i = 0
        while (i < count) {
          out(w) = if (rawBits == 0) 0L else fr.readSigned(rawBits).toLong
          w += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = fr.readUnary().toLong
          val u = (q << param) | fr.readBits(param)
          out(w) = unzigzag(u)
          w += 1; i += 1
        }
      }
      p += 1
    }
    out
  }
}
