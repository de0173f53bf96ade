package graft.multimodal

/** Baseline JPEG (ITU T.81, public spec) — a REAL encoder/decoder pair
  * for 8-bit grayscale AND 3-component YCbCr color at 4:4:4 or
  * chroma-subsampled 4:2:0 (the dominant real-corpus layout; the
  * decoder handles any sampling factors ≤ 2, i.e. also 4:2:2/4:4:0),
  * no codec library at all: marker segments, the Annex K Table
  * K.3/K.5 Huffman tables, run-length AC coding with byte stuffing,
  * interleaved MCUs with per-component table ids, sampling factors and
  * DC predictors, dequantization and a double-precision IDCT,
  * nearest-neighbor chroma upsampling, JFIF YCbCr↔RGB conversion. This is the compressed-image CONTENT step for mm_pixels_jpeg
  * (the DCT upgrade of mm_pixels_png, which covers the zlib/predictor
  * family; reference treats media as opaque bytes — mm.* there never
  * decodes, so this surface is graft's own).
  *
  * Exactness contract used by the oracle: an image tiled from CONSTANT
  * 8×8 blocks survives encode→decode bit-exactly for EVERY gray value,
  * because a constant block's FDCT concentrates everything in DC
  * (AC ≈ 0 → quantizes to zero) and the DC quantizer is 8 — the DCT
  * gain of a flat block — so quantization divides 8·(v−128) back to
  * v−128 with zero loss. The codec itself is general (any 8×8-aligned
  * grayscale content, full Huffman/RLE machinery); generality is
  * spec-pinned against the JDK ImageIO JPEG decoder (exact on DC-only
  * images, ±1 on AC-laden ones — ImageIO's integer IDCT vs our double
  * IDCT).
  */
object JpegCodec {

  // ---- public T.81 constants -------------------------------------------

  /** Zig-zag scan order (T.81 Figure 5): zigzag(k) = natural index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K Table K.3 — luminance DC: code counts per length 1..16 and
    * the category symbols in code order.
    */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K Table K.5 — luminance AC. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Quant table (natural order): DC = 8 — the flat-block DCT gain, so
    * constant tiles round-trip exactly — AC = 16 (any value works; AC
    * of a constant block is ~0 and quantizes to zero regardless).
    */
  private val Quant: Array[Int] = {
    val q = Array.fill(64)(16); q(0) = 8; q
  }

  // canonical Huffman codes from (bits, vals): code/length per symbol
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    var c = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        code(vals(k)) = c
        len(vals(k)) = l
        c += 1; k += 1; i += 1
      }
      c <<= 1
      l += 1
    }
    (code, len)
  }

  private lazy val (dcCode, dcLen) = buildEncTable(DcBits, DcVals)
  private lazy val (acCode, acLen) = buildEncTable(AcBits, AcVals)

  // ---- encoder ----------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n); () } // pad with 1s
  }

  /** magnitude category: smallest s with |v| < 2^s (0 for v = 0). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** T.81 amplitude bits: v ≥ 0 → v; v < 0 → v − 1 in s low bits. */
  private def amplitude(v: Int, s: Int): Int = if (v >= 0) v else v - 1 + (1 << s)

  // cos((2x+1)·u·π/16) — computed once; the first bench round paid
  // ~350M math.cos calls (4096 per naive double-loop coefficient
  // block), putting mm_pixels_jpeg at 5 s where the table + separable
  // two-pass transform is ~1k multiply-adds per block
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 0.7071067811865476 else 1.0)

  private def fdct(block: Array[Double]): Array[Double] = {
    // separable 2D DCT: rows then columns
    val t = new Array[Double](64) // t(y,v) = Σ_x s(x,y)·CosT(x)(v)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosT(x)(v); x += 1 }
        t(y * 8 + v) = s
        v += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += t(yy * 8 + v) * CosT(yy)(u); yy += 1 }
        out(u * 8 + v) = 0.25 * Cn(u) * Cn(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** FDCT + quantize + Huffman-code ONE 8×8 block from `plane` at
    * (bx, by); returns the new DC predictor for this component.
    */
  private def encodeBlock(
      bw: BitWriter,
      plane: Array[Int],
      width: Int,
      bx: Int,
      by: Int,
      pred: Int): Int = {
    val block = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        block(y * 8 + x) = plane((by * 8 + y) * width + bx * 8 + x) - 128.0
        x += 1
      }
      y += 1
    }
    val coef = fdct(block)
    // quantize in zigzag order
    val q = new Array[Int](64)
    var k = 0
    while (k < 64) {
      q(k) = math.round(coef(Zigzag(k)) / Quant(Zigzag(k))).toInt
      k += 1
    }
    // DC: predicted difference
    val diff = q(0) - pred
    val s = category(diff)
    bw.put(dcCode(s), dcLen(s))
    if (s > 0) bw.put(amplitude(diff, s), s)
    // AC: (run, size) with ZRL for 16-zero runs, EOB terminator
    var lastNz = 63
    while (lastNz >= 1 && q(lastNz) == 0) lastNz -= 1
    var run = 0
    k = 1
    while (k <= lastNz) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) { bw.put(acCode(0xf0), acLen(0xf0)); run -= 16 }
        val sz = category(q(k))
        val sym = (run << 4) | sz
        bw.put(acCode(sym), acLen(sym))
        bw.put(amplitude(q(k), sz), sz)
        run = 0
      }
      k += 1
    }
    if (lastNz < 63) bw.put(acCode(0x00), acLen(0x00)) // EOB
    q(0)
  }

  private def writeHeaders(
      out: java.io.ByteArrayOutputStream, width: Int, height: Int, color: Boolean,
      chroma420: Boolean = false, restartInterval: Int = 0): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xdb, 0 +: Zigzag.map(Quant(_))) // DQT: Pq=0/Tq=0, zigzag order
    if (color) {
      // chroma quant table id 1. Same VALUES as table 0 — T.81 tables
      // are arbitrary per-stream data (Annex K is only "typical"); what
      // matters for codec generality is the id-selection machinery.
      seg(0xdb, 1 +: Zigzag.map(Quant(_)))
      // 4:2:0 → luma sampling 2x2 (0x22), chroma 1x1; 4:4:4 → all 1x1
      val ySamp = if (chroma420) 0x22 else 0x11
      seg(0xc0, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff,
        3, 1, ySamp, 0, 2, 0x11, 1, 3, 0x11, 1)) // 3 comps, quant 0/1/1
    } else
      seg(0xc0, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff,
        1, 1, 0x11, 0)) // SOF0: 1 component, 1x1 sampling, quant table 0
    seg(0xc4, (0x00 +: (DcBits ++ DcVals)) ++ (0x10 +: (AcBits ++ AcVals)))
    if (color) // chroma table ids 1, same contents (see DQT comment)
      seg(0xc4, (0x01 +: (DcBits ++ DcVals)) ++ (0x11 +: (AcBits ++ AcVals)))
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >>> 8) & 0xff, restartInterval & 0xff))
    if (color) seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    else seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
  }

  /** Encode an 8-bit grayscale image (width and height multiples of 8)
    * as a complete baseline JPEG: SOI, DQT, SOF0, DHT (Annex K), SOS,
    * Huffman-coded scan with byte stuffing, EOI. Real FDCT + quantize —
    * constant tiles come out DC-only by mathematics, not by shortcut.
    */
  def encodeGray(width: Int, height: Int, pix: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "MCU-aligned dims")
    require(pix.length == width * height)
    val out = new java.io.ByteArrayOutputStream(1024)
    writeHeaders(out, width, height, color = false, restartInterval = restartInterval)
    var bw = new BitWriter(out)
    var pred = 0
    var emitted = 0
    var rst = 0
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        if (restartInterval > 0 && emitted == restartInterval) {
          // restart boundary: pad to the byte edge, RSTn (cycling 0..7),
          // reset the DC predictor — T.81 E.1.4
          bw.flush()
          out.write(0xff); out.write(0xd0 + (rst & 7))
          rst += 1; emitted = 0; pred = 0
          bw = new BitWriter(out)
        }
        pred = encodeBlock(bw, pix, width, bx, by, pred)
        emitted += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit RGB image (width and height multiples of 8) as a
    * COLOR baseline JPEG: JFIF YCbCr conversion (rounded to integer
    * planes), 4:4:4 sampling, interleaved Y/Cb/Cr MCUs with
    * per-component quant/Huffman table ids and DC predictors.
    */
  def encodeColor(
      width: Int, height: Int,
      r: Array[Int], g: Array[Int], b: Array[Int]): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "MCU-aligned dims")
    require(r.length == width * height && g.length == r.length && b.length == r.length)
    val n = width * height
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      // JFIF (public spec) RGB → YCbCr, rounded to integer planes
      val rv = r(i); val gv = g(i); val bv = b(i)
      def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
      yP(i) = clamp(math.round(0.299 * rv + 0.587 * gv + 0.114 * bv))
      cbP(i) = clamp(math.round(128.0 - 0.168736 * rv - 0.331264 * gv + 0.5 * bv))
      crP(i) = clamp(math.round(128.0 + 0.5 * rv - 0.418688 * gv - 0.081312 * bv))
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(2048)
    writeHeaders(out, width, height, color = true)
    val bw = new BitWriter(out)
    val planes = Array(yP, cbP, crP)
    val preds = new Array[Int](3)
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        var c = 0
        while (c < 3) { // interleaved MCU: one block per component at 4:4:4
          preds(c) = encodeBlock(bw, planes(c), width, bx, by, preds(c))
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit RGB image (width and height multiples of 16) as a
    * CHROMA-SUBSAMPLED 4:2:0 baseline JPEG — the dominant real-corpus
    * layout: luma sampling 2×2, chroma 1×1, so each interleaved MCU
    * covers 16×16 pixels with four Y blocks followed by one Cb and one
    * Cr block from half-resolution planes. Chroma downsampling is the
    * standard 2×2 box average with round-half-up ((a+b+c+d+2)>>2) —
    * gray content (Cb=Cr=128 everywhere) survives it exactly, which is
    * what keeps the closed-form oracle for the 420 round-trip.
    */
  def encodeColor420(
      width: Int, height: Int,
      r: Array[Int], g: Array[Int], b: Array[Int]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0, "420-MCU-aligned dims")
    require(r.length == width * height && g.length == r.length && b.length == r.length)
    val n = width * height
    val yP = new Array[Int](n)
    val cbF = new Array[Int](n)
    val crF = new Array[Int](n)
    var i = 0
    while (i < n) {
      val rv = r(i); val gv = g(i); val bv = b(i)
      def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
      yP(i) = clamp(math.round(0.299 * rv + 0.587 * gv + 0.114 * bv))
      cbF(i) = clamp(math.round(128.0 - 0.168736 * rv - 0.331264 * gv + 0.5 * bv))
      crF(i) = clamp(math.round(128.0 + 0.5 * rv - 0.418688 * gv - 0.081312 * bv))
      i += 1
    }
    // 2×2 box-averaged half-resolution chroma planes
    val cw = width / 2
    val ch = height / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        val p0 = (2 * cy) * width + 2 * cx
        val p1 = p0 + width
        cbP(cy * cw + cx) = (cbF(p0) + cbF(p0 + 1) + cbF(p1) + cbF(p1 + 1) + 2) >> 2
        crP(cy * cw + cx) = (crF(p0) + crF(p0 + 1) + crF(p1) + crF(p1 + 1) + 2) >> 2
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream(2048)
    writeHeaders(out, width, height, color = true, chroma420 = true)
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    var my = 0
    while (my < height / 16) {
      var mx = 0
      while (mx < width / 16) {
        // MCU: four Y blocks (2×2, row-major), then one Cb, one Cr
        var vy = 0
        while (vy < 2) {
          var hx = 0
          while (hx < 2) {
            preds(0) = encodeBlock(bw, yP, width, 2 * mx + hx, 2 * my + vy, preds(0))
            hx += 1
          }
          vy += 1
        }
        preds(1) = encodeBlock(bw, cbP, cw, mx, my, preds(1))
        preds(2) = encodeBlock(bw, crP, cw, mx, my, preds(2))
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----------------------------------------------------------

  /** Canonical decode tables: for each code length, the smallest and
    * largest code and the index of its first symbol (T.81 Annex C).
    */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = c
          c += bits(l - 1); k += bits(l - 1)
          maxCode(l) = c - 1
        }
        c <<= 1
        l += 1
      }
    }
    def value(i: Int): Int = vals(i)
  }

  /** Entropy-segment bit reader: un-stuffs 0xFF00, refuses markers. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var bad = false
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) { bad = true; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { bad = true; return 0 }
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else { bad = true; v = 0 } // a real marker inside the scan
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffDec): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (code <= t.maxCode(l)) return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
        if (bad) return -1
      }
      bad = true; -1
    }

    /** Restart boundary (T.81 E.1.4): discard the partial byte's
      * padding bits, then consume one RSTn marker. The pad byte may be
      * UNREAD when the last code ended exactly on a byte edge (and a
      * 0xFF pad carries a stuffed 0x00), so scan a short bounded
      * window forward to the marker — what every production decoder's
      * read_restart does. Sets `bad` (and returns false) if no RSTn
      * appears within it.
      */
    def restartMarker(): Boolean = {
      n = 0 // drop pad bits — entropy data is 1-padded to the byte edge
      var guard = 0
      while (guard < 4 && pos + 1 < b.length) {
        val m0 = b(pos) & 0xff
        val m1 = b(pos + 1) & 0xff
        if (m0 == 0xff && m1 >= 0xd0 && m1 <= 0xd7) { pos += 2; return true }
        pos += 1
        guard += 1
      }
      bad = true
      false
    }
  }

  /** T.81 EXTEND: sign-extend s amplitude bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coef: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    // DC-only shortcut (the standard production-decoder fast path —
    // libjpeg does the same): a block with no AC energy is flat. Our
    // constant-tile corpora are entirely this case; the general path
    // below stays exercised by the AC-laden spec streams.
    var allZero = true
    var k = 1
    while (allZero && k < 64) { if (coef(k) != 0.0) allZero = false; k += 1 }
    if (allZero) {
      // the exact expression the general path reduces to when every
      // non-DC term contributes +0.0 (adding 0.0 is exact in FP, so
      // this IS bit-identical to the full transform, computed once)
      val p = math.round(0.25 * Cn(0) * Cn(0) * coef(0) + 128.0).toInt
      val c = if (p < 0) 0 else if (p > 255) 255 else p
      java.util.Arrays.fill(out, c)
      return out
    }
    // separable 2D IDCT: fold the normalization into the coefficients,
    // then columns and rows
    val g = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) { g(u * 8 + v) = Cn(u) * Cn(v) * coef(u * 8 + v); v += 1 }
      u += 1
    }
    val m = new Array[Double](64) // m(u,x) = Σ_v g(u,v)·CosT(x)(v)
    u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += g(u * 8 + v) * CosT(x)(v); v += 1 }
        m(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += m(uu * 8 + x) * CosT(y)(uu); uu += 1 }
        val p = math.round(0.25 * s + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  /** Shared decode core: marker walk, per-component table selection,
    * interleaved-MCU Huffman entropy decode with per-component DC
    * predictors, dequantize, double IDCT, level shift + clamp.
    * Handles per-component sampling factors 1..2 (4:4:4, 4:2:2, 4:4:0,
    * 4:2:0): each MCU carries h_c × v_c blocks per component and each
    * component decodes into its OWN-resolution plane
    * (ceil(w·h_c/hmax) × ceil(h·v_c/vmax)); [[decodeRgbPixels]]
    * upsamples. Returns (w, h, planes, sampH, sampV). None — never a
    * crash or a stuck loop — for progressive/12-bit streams, sampling
    * factors > 2, hostile segment lengths, truncated entropy data, or
    * over-large declared dimensions. Restart intervals (DRI + RSTn
    * every Ri MCUs — ubiquitous in real crawls, where encoders emit
    * them for error resilience) reset the DC predictors at each
    * marker; a missing or out-of-place RSTn is a malformed stream →
    * None.
    */
  private def decodePlanes(
      b: Array[Byte]): Option[(Int, Int, Array[Array[Int]], Array[Int], Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2
    var w = -1
    var h = -1
    var nc = -1
    val quant = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffDec)
    val acTabs = Array.fill(4)(null: HuffDec)
    val compId = new Array[Int](4)
    val compQuant = new Array[Int](4)
    val compSh = new Array[Int](4)
    val compSv = new Array[Int](4)
    val dcSel = new Array[Int](4)
    val acSel = new Array[Int](4)
    var restartInterval = 0
    var scanAt = -1
    while (scanAt < 0) {
      // seek the next marker (skip fill bytes)
      while (o < b.length && (b(o) & 0xff) != 0xff) o += 1
      while (o < b.length && (b(o) & 0xff) == 0xff) o += 1
      if (o >= b.length) return None
      val m = b(o) & 0xff
      o += 1
      if (m == 0xd9) return None // EOI before any scan
      if (m != 0x01 && !(m >= 0xd0 && m <= 0xd7)) { // standalone markers have no length
        if (o + 2 > b.length) return None
        val len = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        if (len < 2 || o + len > b.length) return None
        val p = o + 2
        val end = o + len
        m match {
          case 0xdb => // DQT: one or more (Pq/Tq, 64 entries) tables
            var q = p
            while (q < end) {
              val pq = (b(q) & 0xff) >>> 4
              val tq = b(q) & 0x0f
              if (pq != 0 || tq > 3 || q + 65 > end) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = b(q + 1 + k) & 0xff; k += 1 }
              quant(tq) = t
              q += 65
            }
          case 0xc4 => // DHT: one or more (Tc/Th, bits, vals) tables
            var q = p
            while (q < end) {
              if (q + 17 > end) return None
              val tc = (b(q) & 0xff) >>> 4
              val th = b(q) & 0x0f
              val bits = (0 until 16).map(i => b(q + 1 + i) & 0xff).toArray
              val n = bits.sum
              if (tc > 1 || th > 3 || n > 256 || q + 17 + n > end) return None
              val vals = (0 until n).map(i => b(q + 17 + i) & 0xff).toArray
              val t = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + n
            }
          case 0xc0 => // SOF0 baseline; any other SOFn → unsupported
            if (end - p < 8) return None
            if ((b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            nc = b(p + 5) & 0xff
            if ((nc != 1 && nc != 3) || end - p < 6 + 3 * nc) return None
            var c = 0
            while (c < nc) {
              compId(c) = b(p + 6 + 3 * c) & 0xff
              val samp = b(p + 7 + 3 * c) & 0xff
              compSh(c) = samp >>> 4
              compSv(c) = samp & 0x0f
              // factors 1..2 cover 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0;
              // single-component scans are non-interleaved in T.81 —
              // keep them to the 1x1 layout this decoder implements
              if (compSh(c) < 1 || compSh(c) > 2 || compSv(c) < 1 || compSv(c) > 2)
                return None
              if (nc == 1 && (compSh(c) != 1 || compSv(c) != 1)) return None
              compQuant(c) = b(p + 8 + 3 * c) & 0xff
              if (compQuant(c) > 3) return None
              c += 1
            }
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
          case c if c >= 0xc1 && c <= 0xcf && c != 0xc4 && c != 0xc8 && c != 0xcc =>
            return None // progressive/extended/arithmetic SOF
          case 0xda => // SOS: component order must match SOF order
            if (nc < 0 || end - p < 4 + 2 * nc || (b(p) & 0xff) != nc) return None
            var c = 0
            while (c < nc) {
              if ((b(p + 1 + 2 * c) & 0xff) != compId(c)) return None
              dcSel(c) = (b(p + 2 + 2 * c) & 0xff) >>> 4
              acSel(c) = b(p + 2 + 2 * c) & 0x0f
              if (dcSel(c) > 3 || acSel(c) > 3) return None
              c += 1
            }
            scanAt = end
          case 0xdd => // DRI: restart interval in MCUs (0 = none)
            if (end - p < 2) return None
            restartInterval = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          case _ => () // APPn / COM / others: skip
        }
        o = end
      }
    }
    if (w < 0) return None
    var c = 0
    while (c < nc) {
      if (quant(compQuant(c)) == null ||
        dcTabs(dcSel(c)) == null || acTabs(acSel(c)) == null) return None
      c += 1
    }
    // per-component own-resolution plane dims (T.81 A.1.1)
    var hmax = 1
    var vmax = 1
    c = 0
    while (c < nc) {
      if (compSh(c) > hmax) hmax = compSh(c)
      if (compSv(c) > vmax) vmax = compSv(c)
      c += 1
    }
    val compW = Array.tabulate(nc)(ci => (w * compSh(ci) + hmax - 1) / hmax)
    val compH = Array.tabulate(nc)(ci => (h * compSv(ci) + vmax - 1) / vmax)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = Array.tabulate(nc)(ci => new Array[Int](compW(ci) * compH(ci)))
    val coef = new Array[Double](64)
    val r = new BitReader(b, scanAt)
    val preds = new Array[Int](4)
    var mcuCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount == restartInterval) {
          if (!r.restartMarker()) return None
          java.util.Arrays.fill(preds, 0)
          mcuCount = 0
        }
        var ci = 0
        while (ci < nc) { // interleaved MCU: h_c × v_c blocks per component
          val q = quant(compQuant(ci))
          val cw = compW(ci)
          val chh = compH(ci)
          val plane = planes(ci)
          var vy = 0
          while (vy < compSv(ci)) {
            var hx = 0
            while (hx < compSh(ci)) {
              java.util.Arrays.fill(coef, 0.0)
              val s = r.decode(dcTabs(dcSel(ci)))
              if (r.bad || s < 0 || s > 11) return None
              preds(ci) += extend(r.bits(s), s)
              coef(0) = preds(ci).toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = r.decode(acTabs(acSel(ci)))
                if (r.bad || rs < 0) return None
                val run = rs >>> 4
                val sz = rs & 0x0f
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  if (k > 63) return None
                  coef(Zigzag(k)) = extend(r.bits(sz), sz).toDouble * q(Zigzag(k))
                  k += 1
                }
                if (r.bad) return None
              }
              val block = idct(coef)
              val bx = mx * compSh(ci) + hx
              val by = my * compSv(ci) + vy
              var y = 0
              while (y < 8) {
                val py = by * 8 + y
                if (py < chh) {
                  var x = 0
                  while (x < 8) {
                    val px = bx * 8 + x
                    if (px < cw) plane(py * cw + px) = block(y * 8 + x)
                    x += 1
                  }
                }
                y += 1
              }
              hx += 1
            }
            vy += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    Some((w, h, planes, compSh.take(nc), compSv.take(nc)))
  }

  /** REAL baseline-JPEG grayscale pixel decode (1-component streams
    * only — color streams go through [[decodeRgbPixels]]).
    */
  def decodeGrayPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeAnyPlanes(b) match {
      case Some((w, h, planes, _, _)) if planes.length == 1 => Some((w, h, planes(0)))
      case _ => None
    }

  /** Frame-type dispatch: baseline (SOF0) streams take [[decodePlanes]],
    * progressive (SOF2) streams take [[decodePlanesProgressive]]. A
    * cheap bounded marker walk finds the SOF first so neither path has
    * to speculatively parse the other's frames.
    */
  private def decodeAnyPlanes(
      b: Array[Byte]): Option[(Int, Int, Array[Array[Int]], Array[Int], Array[Int])] = {
    findSofMarker(b) match {
      case 0xc0 => decodePlanes(b)
      case 0xc2 => decodePlanesProgressive(b)
      case _ => None
    }
  }

  /** First SOFn marker byte of the stream, or -1. Bounded: every
    * segment either advances by its declared length or the walk ends.
    */
  private def findSofMarker(b: Array[Byte]): Int = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return -1
    var o = 2
    while (o < b.length) {
      while (o < b.length && (b(o) & 0xff) != 0xff) o += 1
      while (o < b.length && (b(o) & 0xff) == 0xff) o += 1
      if (o >= b.length) return -1
      val m = b(o) & 0xff
      o += 1
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) return m
      if (m == 0xd9 || m == 0xda) return -1 // EOI / scan before any SOF
      if (m != 0x01 && !(m >= 0xd0 && m <= 0xd7)) {
        if (o + 2 > b.length) return -1
        val len = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        if (len < 2 || o + len > b.length) return -1
        o += len
      }
    }
    -1
  }

  /** Separable triangle chroma upsampler (the libjpeg "fancy
    * upsampling" family): per subsampled axis the output pixel blends
    * its NEAREST chroma sample (weight 3) with the phase-side
    * neighbor (weight 1) — chroma centers sit at 2k+0.5, so an even
    * output pixel leans on sample k−1 and an odd one on k+1, edges
    * clamped. Axes at full resolution pass through (weight 1). The
    * combined 2D weights for 4:2:0 are 9/3/3/1 over 16 with a fixed
    * +den/2 half-up rounding (libjpeg alternates +1/+2; ours is one
    * documented constant). A CONSTANT plane is reproduced exactly
    * ((128·16 + 8) div 16 = 128), which is what keeps the gray-chroma
    * closed-form oracle valid under either upsampler.
    */
  def upsampleTriangle(plane: Array[Int], cw: Int, ch: Int, rx: Int, ry: Int,
      w: Int, h: Int): Array[Int] = {
    require(rx >= 1 && rx <= 2 && ry >= 1 && ry <= 2, "factors 1..2")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val ky = y / ry
      val fy =
        if (ry == 2) math.min(math.max(ky + (if (y % 2 == 1) 1 else -1), 0), ch - 1)
        else ky
      val wyF = if (ry == 2) 1 else 0
      val wyN = if (ry == 2) 3 else 1
      var x = 0
      while (x < w) {
        val kx = x / rx
        val fx =
          if (rx == 2) math.min(math.max(kx + (if (x % 2 == 1) 1 else -1), 0), cw - 1)
          else kx
        val wxF = if (rx == 2) 1 else 0
        val wxN = if (rx == 2) 3 else 1
        val sum = wyN * (wxN * plane(ky * cw + kx) + wxF * plane(ky * cw + fx)) +
          wyF * (wxN * plane(fy * cw + kx) + wxF * plane(fy * cw + fx))
        val den = (wyN + wyF) * (wxN + wxF)
        out(y * w + x) = (sum + den / 2) / den
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL baseline COLOR JPEG pixel decode: the 3-component
    * interleaved scan through [[decodePlanes]] (4:4:4 or
    * chroma-subsampled 4:2:2 / 4:4:0 / 4:2:0), then chroma upsampling
    * for subsampled components — sample replication by default, the
    * [[upsampleTriangle]] filter when `fancyChroma` (what libjpeg's
    * default decode does on real photographs; identical on constant
    * chroma) — then the JFIF YCbCr → RGB conversion (round + clamp
    * per channel).
    */
  def decodeRgbPixels(b: Array[Byte], fancyChroma: Boolean = false): Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    decodeAnyPlanes(b) match {
      case Some((w, h, planes, sh, sv)) if planes.length == 3 =>
        val n = w * h
        val r = new Array[Int](n)
        val g = new Array[Int](n)
        val bl = new Array[Int](n)
        var hmax = 1
        var vmax = 1
        var ci = 0
        while (ci < 3) {
          if (sh(ci) > hmax) hmax = sh(ci)
          if (sv(ci) > vmax) vmax = sv(ci)
          ci += 1
        }
        // component sample at full-res (x, y): own-plane coordinate is
        // (x·h_c/hmax, y·v_c/vmax) — sample replication, the exact
        // inverse of the encoder's box average on constant chroma
        val cws = Array.tabulate(3)(c => (w * sh(c) + hmax - 1) / hmax)
        val chs = Array.tabulate(3)(c => (h * sv(c) + vmax - 1) / vmax)
        // triangle mode: pre-upsample each subsampled plane ONCE
        // (O(n) total) instead of filtering per output pixel
        val fancy: Array[Array[Int]] = Array.tabulate(3) { c =>
          val rx = hmax / sh(c)
          val ry = vmax / sv(c)
          if (fancyChroma && (rx > 1 || ry > 1))
            upsampleTriangle(planes(c), cws(c), chs(c), rx, ry, w, h)
          else null
        }
        def samp(c: Int, x: Int, y: Int): Int =
          if (fancy(c) != null) fancy(c)(y * w + x)
          else planes(c)((y * sv(c) / vmax) * cws(c) + (x * sh(c) / hmax))
        def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y * w + x
            val yy = samp(0, x, y).toDouble
            val cb = samp(1, x, y) - 128.0
            val cr = samp(2, x, y) - 128.0
            r(i) = clamp(math.round(yy + 1.402 * cr))
            g(i) = clamp(math.round(yy - 0.344136 * cb - 0.714136 * cr))
            bl(i) = clamp(math.round(yy + 1.772 * cb))
            x += 1
          }
          y += 1
        }
        Some((w, h, r, g, bl))
      case _ => None
    }

  // ---- progressive JPEG (T.81 Annex G, SOF2) -----------------------------
  //
  // Progressive streams split each block's 64 quantized coefficients
  // across MANY scans: spectral selection (a zigzag band [Ss, Se] per
  // scan) and successive approximation (high-order magnitude bits
  // first — point transform Al — refined one bit per later scan).
  // Taken to Al = 0 the accumulation is LOSSLESS: the final
  // coefficients equal what a baseline encoder would have written, so
  // progressive decode of an image is BIT-IDENTICAL to baseline decode
  // of the same image (JpegProgressiveSpec pins exactly that, plus
  // ImageIO cross-decodes in both directions). Real web crawls are
  // full of SOF2 streams (every "optimized" photo exporter emits
  // them); this section closes the one decode-path gap the round-19
  // review found, with the same no-library contract as the baseline
  // codec.

  /** Progressive AC Huffman table for the ENCODER: Annex K's AC table
    * lacks the EOBn symbols (end-of-band run codes 0x10..0xE0, size 0)
    * progressive scans need, so the encoder carries its own table with
    * every symbol it can emit — EOBn for n = 0..14, ZRL, and
    * (run, size) for size 1..10 — all at 8 bits (176 of the 256 codes;
    * canonical and incomplete, the all-ones code unassigned). Tables
    * are per-stream data: the decoder reads whatever DHT arrives.
    */
  private val ProgAcVals: Array[Int] = {
    val eobn = (0 to 14).map(_ << 4)
    val rs = for { run <- 0 to 15; size <- 1 to 10 } yield (run << 4) | size
    (eobn ++ Seq(0xf0) ++ rs).toArray
  }
  private val ProgAcBits: Array[Int] = {
    val a = new Array[Int](16); a(7) = ProgAcVals.length; a
  }
  private lazy val (progAcCode, progAcLen) = buildEncTable(ProgAcBits, ProgAcVals)

  /** One scan of a progressive script: the frame-component indices it
    * covers, the zigzag band, and the approximation bit positions.
    */
  private final case class ProgScan(comps: Array[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** Grayscale script (the libjpeg default shape): DC first at Al=1,
    * two AC bands at Al=2, an AC refinement to Al=1, the last DC bit,
    * the final AC refinement to Al=0.
    */
  private val GrayProgScript: Array[ProgScan] = Array(
    ProgScan(Array(0), 0, 0, 0, 1),
    ProgScan(Array(0), 1, 5, 0, 2),
    ProgScan(Array(0), 6, 63, 0, 2),
    ProgScan(Array(0), 1, 63, 2, 1),
    ProgScan(Array(0), 0, 0, 1, 0),
    ProgScan(Array(0), 1, 63, 1, 0))

  /** Color 4:4:4 script: interleaved DC scans; AC scans are always
    * single-component (T.81 G.1 forbids interleaved AC).
    */
  private val ColorProgScript: Array[ProgScan] = Array(
    ProgScan(Array(0, 1, 2), 0, 0, 0, 1),
    ProgScan(Array(0), 1, 5, 0, 2),
    ProgScan(Array(1), 1, 63, 0, 1),
    ProgScan(Array(2), 1, 63, 0, 1),
    ProgScan(Array(0), 6, 63, 0, 2),
    ProgScan(Array(0), 1, 63, 2, 1),
    ProgScan(Array(0, 1, 2), 0, 0, 1, 0),
    ProgScan(Array(1), 1, 63, 1, 0),
    ProgScan(Array(2), 1, 63, 1, 0),
    ProgScan(Array(0), 1, 63, 1, 0))

  /** FDCT + quantize every 8×8 block of a plane — the same arithmetic
    * [[encodeBlock]] runs inline — kept as whole zigzag-order blocks so
    * the scan emitters can slice bands out of them.
    */
  private def quantBlocks(plane: Array[Int], width: Int, height: Int): Array[Array[Int]] = {
    val bw = width / 8
    val bh = height / 8
    val out = new Array[Array[Int]](bw * bh)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val block = new Array[Double](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            block(y * 8 + x) = plane((by * 8 + y) * width + bx * 8 + x) - 128.0
            x += 1
          }
          y += 1
        }
        val coef = fdct(block)
        val q = new Array[Int](64)
        var k = 0
        while (k < 64) {
          q(k) = math.round(coef(Zigzag(k)) / Quant(Zigzag(k))).toInt
          k += 1
        }
        out(by * bw + bx) = q
        bx += 1
      }
      by += 1
    }
    out
  }

  private def segTo(out: java.io.ByteArrayOutputStream, m: Int, payload: Array[Int]): Unit = {
    out.write(0xff); out.write(m)
    val len = payload.length + 2
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    payload.foreach(v => out.write(v & 0xff))
  }

  private def writeProgHeaders(out: java.io.ByteArrayOutputStream,
      width: Int, height: Int, color: Boolean, restartInterval: Int): Unit = {
    out.write(0xff); out.write(0xd8) // SOI
    segTo(out, 0xdb, 0 +: Zigzag.map(Quant(_)))
    if (color) segTo(out, 0xdb, 1 +: Zigzag.map(Quant(_)))
    if (color)
      segTo(out, 0xc2, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff,
        3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    else
      segTo(out, 0xc2, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff,
        1, 1, 0x11, 0))
    segTo(out, 0xc4, (0x00 +: (DcBits ++ DcVals)) ++ (0x10 +: (ProgAcBits ++ ProgAcVals)))
    if (color)
      segTo(out, 0xc4, (0x01 +: (DcBits ++ DcVals)) ++ (0x11 +: (ProgAcBits ++ ProgAcVals)))
    if (restartInterval > 0)
      segTo(out, 0xdd, Array((restartInterval >>> 8) & 0xff, restartInterval & 0xff))
  }

  private def writeSos(out: java.io.ByteArrayOutputStream, sc: ProgScan): Unit = {
    val ns = sc.comps.length
    val payload = new Array[Int](1 + 2 * ns + 3)
    payload(0) = ns
    var i = 0
    while (i < ns) {
      val c = sc.comps(i)
      payload(1 + 2 * i) = c + 1 // component ids are 1-based in our SOF
      val tid = if (c == 0) 0 else 1
      payload(2 + 2 * i) = (tid << 4) | tid
      i += 1
    }
    payload(1 + 2 * ns) = sc.ss
    payload(2 + 2 * ns) = sc.se
    payload(3 + 2 * ns) = (sc.ah << 4) | sc.al
    segTo(out, 0xda, payload)
  }

  /** DC scan emitter (first pass or refinement bit), interleaved over
    * the scan's components in block-raster MCU order (every component
    * here is 1×1 sampled, so an MCU is one block per component).
    * First pass codes (coef >> Al) as predicted differences —
    * arithmetic shift per G.1.2.1; refinement emits bit Al of each DC
    * coefficient raw (no Huffman).
    */
  private def emitDcScan(out: java.io.ByteArrayOutputStream,
      comps: Array[Array[Array[Int]]], scanComps: Array[Int],
      ah: Int, al: Int, restartInterval: Int): Unit = {
    val nb = comps(scanComps(0)).length
    var bw = new BitWriter(out)
    val preds = new Array[Int](comps.length)
    var emitted = 0
    var rst = 0
    var i = 0
    while (i < nb) {
      if (restartInterval > 0 && emitted == restartInterval) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + (rst & 7))
        rst += 1; emitted = 0
        java.util.Arrays.fill(preds, 0)
        bw = new BitWriter(out)
      }
      var ci = 0
      while (ci < scanComps.length) {
        val c = scanComps(ci)
        val v = comps(c)(i)(0) >> al
        if (ah > 0) bw.put(v & 1, 1)
        else {
          val diff = v - preds(c)
          preds(c) = v
          val s = category(diff)
          bw.put(dcCode(s), dcLen(s))
          if (s > 0) bw.put(amplitude(diff, s), s)
        }
        ci += 1
      }
      emitted += 1
      i += 1
    }
    bw.flush()
  }

  /** AC first-pass scan emitter (G.1.2.2): per block, the band's
    * coefficients at precision Al (sign-magnitude shift toward zero)
    * as baseline-style (run, size) symbols, with all-zero remainders
    * accumulated into cross-block EOBn runs.
    */
  private def emitAcFirstScan(out: java.io.ByteArrayOutputStream,
      blocks: Array[Array[Int]], ss: Int, se: Int, al: Int,
      restartInterval: Int): Unit = {
    var bw = new BitWriter(out)
    var eobrun = 0
    def flushEobrun(): Unit = if (eobrun > 0) {
      val n = 31 - Integer.numberOfLeadingZeros(eobrun)
      val sym = n << 4
      bw.put(progAcCode(sym), progAcLen(sym))
      if (n > 0) bw.put(eobrun - (1 << n), n)
      eobrun = 0
    }
    var emitted = 0
    var rst = 0
    var i = 0
    while (i < blocks.length) {
      if (restartInterval > 0 && emitted == restartInterval) {
        flushEobrun(); bw.flush()
        out.write(0xff); out.write(0xd0 + (rst & 7))
        rst += 1; emitted = 0
        bw = new BitWriter(out)
      }
      val q = blocks(i)
      var lastNz = -1
      var k = se
      while (k >= ss && lastNz < 0) {
        if ((math.abs(q(k)) >> al) != 0) lastNz = k
        k -= 1
      }
      if (lastNz < 0) { eobrun += 1; if (eobrun == 0x7fff) flushEobrun() }
      else {
        flushEobrun()
        var run = 0
        k = ss
        while (k <= lastNz) {
          val m = math.abs(q(k)) >> al
          if (m == 0) run += 1
          else {
            while (run >= 16) { bw.put(progAcCode(0xf0), progAcLen(0xf0)); run -= 16 }
            val s = category(m)
            val sym = (run << 4) | s
            bw.put(progAcCode(sym), progAcLen(sym))
            bw.put(amplitude(if (q(k) < 0) -m else m, s), s)
            run = 0
          }
          k += 1
        }
        if (lastNz < se) { eobrun += 1; if (eobrun == 0x7fff) flushEobrun() }
      }
      emitted += 1
      i += 1
    }
    flushEobrun()
    bw.flush()
  }

  /** AC refinement scan emitter (G.1.2.3) — the subtle one. Newly
    * visible coefficients (magnitude exactly 1 at this precision) are
    * coded as (zero-history-run, 1) symbols plus a sign bit;
    * already-nonzero coefficients contribute one raw correction bit
    * each, BUFFERED and emitted after the next symbol (or after the
    * EOBn covering them) so the decoder — which reads a correction bit
    * whenever its skip-walk passes a nonzero coefficient — sees them
    * in exactly walk order. Mirrors the libjpeg BR-buffer structure,
    * including the eager ZRL emission while r > 15 before the band's
    * last new coefficient.
    */
  private def emitAcRefineScan(out: java.io.ByteArrayOutputStream,
      blocks: Array[Array[Int]], ss: Int, se: Int, al: Int,
      restartInterval: Int): Unit = {
    var bw = new BitWriter(out)
    var eobrun = 0
    val runHeld = new java.util.ArrayList[Int] // bits owed to the pending EOBn
    val blockHeld = new java.util.ArrayList[Int] // bits since the last symbol of this block
    def flushEobrun(): Unit = {
      if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        val sym = n << 4
        bw.put(progAcCode(sym), progAcLen(sym))
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      var j = 0
      while (j < runHeld.size) { bw.put(runHeld.get(j), 1); j += 1 }
      runHeld.clear()
    }
    def emitBlockHeld(): Unit = {
      var j = 0
      while (j < blockHeld.size) { bw.put(blockHeld.get(j), 1); j += 1 }
      blockHeld.clear()
    }
    var emitted = 0
    var rst = 0
    var i = 0
    while (i < blocks.length) {
      if (restartInterval > 0 && emitted == restartInterval) {
        flushEobrun(); bw.flush()
        out.write(0xff); out.write(0xd0 + (rst & 7))
        rst += 1; emitted = 0
        bw = new BitWriter(out)
      }
      val q = blocks(i)
      // last newly-visible coefficient of the band (shifted magnitude 1)
      var eobPos = ss - 1
      var k = ss
      while (k <= se) {
        if ((math.abs(q(k)) >> al) == 1) eobPos = k
        k += 1
      }
      var r = 0
      k = ss
      while (k <= se) {
        val t = math.abs(q(k)) >> al
        if (t == 0) r += 1
        else {
          while (r > 15 && k <= eobPos) {
            flushEobrun()
            bw.put(progAcCode(0xf0), progAcLen(0xf0))
            r -= 16
            emitBlockHeld()
          }
          if (t > 1) blockHeld.add(t & 1)
          else {
            flushEobrun()
            val sym = (r << 4) | 1
            bw.put(progAcCode(sym), progAcLen(sym))
            bw.put(if (q(k) < 0) 0 else 1, 1)
            emitBlockHeld()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || blockHeld.size > 0) {
        eobrun += 1
        runHeld.addAll(blockHeld)
        blockHeld.clear()
        if (eobrun == 0x7fff || runHeld.size > 900) flushEobrun()
      }
      emitted += 1
      i += 1
    }
    flushEobrun()
    bw.flush()
  }

  private def emitScript(out: java.io.ByteArrayOutputStream,
      comps: Array[Array[Array[Int]]], script: Array[ProgScan],
      restartInterval: Int): Unit = {
    script.foreach { sc =>
      writeSos(out, sc)
      if (sc.ss == 0) emitDcScan(out, comps, sc.comps, sc.ah, sc.al, restartInterval)
      else if (sc.ah == 0)
        emitAcFirstScan(out, comps(sc.comps(0)), sc.ss, sc.se, sc.al, restartInterval)
      else
        emitAcRefineScan(out, comps(sc.comps(0)), sc.ss, sc.se, sc.al, restartInterval)
    }
  }

  /** Encode grayscale as a complete PROGRESSIVE JPEG (SOF2) through
    * [[GrayProgScript]]. Same FDCT/quantizer as [[encodeGray]], so the
    * decoded pixels are bit-identical between the two encodings.
    * `restartInterval` > 0 additionally writes DRI and an RSTn marker
    * every that-many MCUs of every scan (predictors and EOB runs
    * reset), exercising the restart machinery real crawls carry.
    */
  def encodeGrayProgressive(width: Int, height: Int, pix: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "MCU-aligned dims")
    require(pix.length == width * height)
    val out = new java.io.ByteArrayOutputStream(1024)
    writeProgHeaders(out, width, height, color = false, restartInterval)
    emitScript(out, Array(quantBlocks(pix, width, height)), GrayProgScript, restartInterval)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode RGB as a PROGRESSIVE color JPEG (SOF2, 4:4:4) through
    * [[ColorProgScript]] — the same JFIF conversion and quantizer as
    * [[encodeColor]], split across ten scans.
    */
  def encodeColorProgressive(width: Int, height: Int,
      r: Array[Int], g: Array[Int], b: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "MCU-aligned dims")
    require(r.length == width * height && g.length == r.length && b.length == r.length)
    val n = width * height
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val rv = r(i); val gv = g(i); val bv = b(i)
      def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
      yP(i) = clamp(math.round(0.299 * rv + 0.587 * gv + 0.114 * bv))
      cbP(i) = clamp(math.round(128.0 - 0.168736 * rv - 0.331264 * gv + 0.5 * bv))
      crP(i) = clamp(math.round(128.0 + 0.5 * rv - 0.418688 * gv - 0.081312 * bv))
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(2048)
    writeProgHeaders(out, width, height, color = true, restartInterval)
    emitScript(out,
      Array(quantBlocks(yP, width, height), quantBlocks(cbP, width, height),
        quantBlocks(crP, width, height)),
      ColorProgScript, restartInterval)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** One DC entropy unit of a progressive scan: first pass accumulates
    * the predicted difference and stores (pred << Al); refinement ORs
    * in bit Al from one raw bit.
    */
  private def dcUnit(r: BitReader, cz: Array[Int], off: Int, tab: HuffDec,
      preds: Array[Int], c: Int, ah: Int, al: Int): Boolean = {
    if (ah == 0) {
      val s = r.decode(tab)
      if (r.bad || s < 0 || s > 11) return false
      preds(c) += extend(r.bits(s), s)
      cz(off) = preds(c) << al
    } else if (r.bit() == 1) cz(off) |= (1 << al)
    !r.bad
  }

  /** Progressive DC scan decode — interleaved MCU order when the scan
    * covers several components (h_c × v_c blocks each, padded grid),
    * used-block raster when it covers one.
    */
  private def decodeDcScan(r: BitReader, coefs: Array[Array[Int]],
      scanComp: Array[Int], tabs: Array[HuffDec], ah: Int, al: Int, ri: Int,
      compSh: Array[Int], compSv: Array[Int], padW: Array[Int],
      usedW: Array[Int], usedH: Array[Int], mcusX: Int, mcusY: Int): Boolean = {
    val preds = new Array[Int](coefs.length)
    var count = 0
    if (scanComp.length > 1) {
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (ri > 0 && count == ri) {
            if (!r.restartMarker()) return false
            java.util.Arrays.fill(preds, 0)
            count = 0
          }
          var i = 0
          while (i < scanComp.length) {
            val c = scanComp(i)
            var vy = 0
            while (vy < compSv(c)) {
              var hx = 0
              while (hx < compSh(c)) {
                val bi = (my * compSv(c) + vy) * padW(c) + mx * compSh(c) + hx
                if (!dcUnit(r, coefs(c), bi * 64, tabs(i), preds, c, ah, al)) return false
                hx += 1
              }
              vy += 1
            }
            i += 1
          }
          count += 1
          mx += 1
        }
        my += 1
      }
    } else {
      val c = scanComp(0)
      var by = 0
      while (by < usedH(c)) {
        var bx = 0
        while (bx < usedW(c)) {
          if (ri > 0 && count == ri) {
            if (!r.restartMarker()) return false
            java.util.Arrays.fill(preds, 0)
            count = 0
          }
          if (!dcUnit(r, coefs(c), (by * padW(c) + bx) * 64, tabs(0), preds, c, ah, al))
            return false
          count += 1
          bx += 1
        }
        by += 1
      }
    }
    !r.bad
  }

  /** Progressive AC scan decode (single component, used-block raster):
    * first pass places (EXTENDed value << Al) with EOBn runs; the
    * refinement pass walks the skip-run reading one correction bit per
    * nonzero coefficient passed, places new ±(1 << Al) values, and
    * consumes correction bits for the band remainders covered by EOB
    * runs. Restart boundaries reset the EOB run.
    */
  private def decodeAcScan(r: BitReader, cz: Array[Int], tab: HuffDec,
      ss: Int, se: Int, ah: Int, al: Int, ri: Int,
      uw: Int, uh: Int, pw: Int): Boolean = {
    var eobrun = 0
    var count = 0
    val p1 = 1 << al
    var by = 0
    while (by < uh) {
      var bx = 0
      while (bx < uw) {
        if (ri > 0 && count == ri) {
          if (!r.restartMarker()) return false
          eobrun = 0
          count = 0
        }
        val off = (by * pw + bx) * 64
        if (ah == 0) {
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var stop = false
            while (k <= se && !stop) {
              val rs = r.decode(tab)
              if (r.bad || rs < 0) return false
              val run = rs >>> 4
              val s = rs & 15
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1
                  if (run > 0) eobrun += r.bits(run)
                  stop = true
                }
              } else {
                k += run
                if (k > se) return false
                cz(off + k) = extend(r.bits(s), s) << al
                k += 1
              }
              if (r.bad) return false
            }
          }
        } else {
          var k = ss
          if (eobrun == 0) {
            var stop = false
            while (k <= se && !stop) {
              val rs = r.decode(tab)
              if (r.bad || rs < 0) return false
              var run = rs >>> 4
              val s = rs & 15
              var value = 0
              if (s == 0) {
                if (run != 15) { // EOBn: remainder of this block + run more
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.bits(run)
                  stop = true
                }
              } else {
                if (s != 1) return false // only magnitude-1 news in refine
                value = if (r.bit() == 1) p1 else -p1
              }
              if (!stop) {
                var placed = false
                while (k <= se && !placed) {
                  val cv = cz(off + k)
                  if (cv != 0) {
                    if (r.bit() == 1 && (cv & p1) == 0)
                      cz(off + k) = cv + (if (cv >= 0) p1 else -p1)
                  } else if (run == 0) {
                    if (s != 0) cz(off + k) = value
                    placed = true
                  } else run -= 1
                  k += 1
                  if (r.bad) return false
                }
                if (!placed && s != 0) return false // band overran
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val cv = cz(off + k)
              if (cv != 0) {
                if (r.bit() == 1 && (cv & p1) == 0)
                  cz(off + k) = cv + (if (cv >= 0) p1 else -p1)
              }
              k += 1
              if (r.bad) return false
            }
            eobrun -= 1
          }
        }
        count += 1
        bx += 1
      }
      by += 1
    }
    !r.bad
  }

  /** Progressive decode core: the marker walk parses DQT/DHT/SOF2/DRI
    * and then EVERY scan up to EOI, accumulating each component's
    * quantized coefficients (zigzag order, MCU-padded grid) across
    * scans, then dequantizes and IDCTs every used block ONCE — so the
    * constant-tile exactness contract (and the closed-form oracle that
    * rides it) is the same as baseline's. Returns None — never a crash
    * or a stuck loop — for malformed headers, out-of-range band or
    * approximation fields, an interleaved AC scan, missing tables,
    * truncated entropy data, or coefficient storage above the 2^26-int
    * cap (progressive NEEDS whole-image coefficient memory, unlike the
    * streaming baseline path, so the cap is on exactly that).
    */
  private def decodePlanesProgressive(b: Array[Byte])
      : Option[(Int, Int, Array[Array[Int]], Array[Int], Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2
    var w = -1
    var h = -1
    var nc = -1
    val quant = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffDec)
    val acTabs = Array.fill(4)(null: HuffDec)
    val compId = new Array[Int](4)
    val compQuant = new Array[Int](4)
    val compSh = new Array[Int](4)
    val compSv = new Array[Int](4)
    var restartInterval = 0
    var coefs: Array[Array[Int]] = null
    var padW: Array[Int] = null
    var usedW: Array[Int] = null
    var usedH: Array[Int] = null
    var compW: Array[Int] = null
    var compH: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var sawScan = false
    var done = false
    while (!done) {
      while (o < b.length && (b(o) & 0xff) != 0xff) o += 1
      while (o < b.length && (b(o) & 0xff) == 0xff) o += 1
      if (o >= b.length) return None
      val m = b(o) & 0xff
      o += 1
      if (m == 0xd9) { // EOI
        if (!sawScan) return None
        done = true
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // standalone
      else {
        if (o + 2 > b.length) return None
        val len = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        if (len < 2 || o + len > b.length) return None
        val p = o + 2
        val end = o + len
        var resumeAt = end
        m match {
          case 0xdb =>
            var q = p
            while (q < end) {
              val pq = (b(q) & 0xff) >>> 4
              val tq = b(q) & 0x0f
              if (pq != 0 || tq > 3 || q + 65 > end) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = b(q + 1 + k) & 0xff; k += 1 }
              quant(tq) = t
              q += 65
            }
          case 0xc4 =>
            var q = p
            while (q < end) {
              if (q + 17 > end) return None
              val tc = (b(q) & 0xff) >>> 4
              val th = b(q) & 0x0f
              val bits = (0 until 16).map(i => b(q + 1 + i) & 0xff).toArray
              val n = bits.sum
              if (tc > 1 || th > 3 || n > 256 || q + 17 + n > end) return None
              val vals = (0 until n).map(i => b(q + 17 + i) & 0xff).toArray
              val t = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + n
            }
          case 0xdd =>
            if (end - p < 2) return None
            restartInterval = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          case 0xc2 =>
            if (coefs != null) return None // one frame per stream
            if (end - p < 8 || (b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            nc = b(p + 5) & 0xff
            if ((nc != 1 && nc != 3) || end - p < 6 + 3 * nc) return None
            var c = 0
            while (c < nc) {
              compId(c) = b(p + 6 + 3 * c) & 0xff
              val samp = b(p + 7 + 3 * c) & 0xff
              compSh(c) = samp >>> 4
              compSv(c) = samp & 0x0f
              if (compSh(c) < 1 || compSh(c) > 2 || compSv(c) < 1 || compSv(c) > 2)
                return None
              if (nc == 1 && (compSh(c) != 1 || compSv(c) != 1)) return None
              compQuant(c) = b(p + 8 + 3 * c) & 0xff
              if (compQuant(c) > 3) return None
              c += 1
            }
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
            var hmax = 1
            var vmax = 1
            c = 0
            while (c < nc) {
              if (compSh(c) > hmax) hmax = compSh(c)
              if (compSv(c) > vmax) vmax = compSv(c)
              c += 1
            }
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            compW = Array.tabulate(nc)(ci => (w * compSh(ci) + hmax - 1) / hmax)
            compH = Array.tabulate(nc)(ci => (h * compSv(ci) + vmax - 1) / vmax)
            padW = Array.tabulate(nc)(ci => mcusX * compSh(ci))
            val padHv = Array.tabulate(nc)(ci => mcusY * compSv(ci))
            usedW = Array.tabulate(nc)(ci => (compW(ci) + 7) / 8)
            usedH = Array.tabulate(nc)(ci => (compH(ci) + 7) / 8)
            var total = 0L
            c = 0
            while (c < nc) { total += padW(c).toLong * padHv(c) * 64; c += 1 }
            if (total > (1L << 26)) return None
            coefs = Array.tabulate(nc)(ci => new Array[Int](padW(ci) * padHv(ci) * 64))
          case 0xc0 => return None // baseline frame: wrong path
          case cc if cc >= 0xc1 && cc <= 0xcf && cc != 0xc4 && cc != 0xc8 && cc != 0xcc =>
            return None
          case 0xda =>
            if (coefs == null) return None
            if (end - p < 1) return None
            val ns = b(p) & 0xff
            if (ns < 1 || ns > nc || end - p < 1 + 2 * ns + 3) return None
            val scanComp = new Array[Int](ns)
            val dcSel = new Array[Int](ns)
            val acSel = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = b(p + 1 + 2 * i) & 0xff
              var idx = -1
              var c2 = 0
              while (c2 < nc) { if (compId(c2) == cid) idx = c2; c2 += 1 }
              if (idx < 0) return None
              scanComp(i) = idx
              dcSel(i) = (b(p + 2 + 2 * i) & 0xff) >>> 4
              acSel(i) = b(p + 2 + 2 * i) & 0x0f
              if (dcSel(i) > 3 || acSel(i) > 3) return None
              i += 1
            }
            val ssv = b(p + 1 + 2 * ns) & 0xff
            val sev = b(p + 2 + 2 * ns) & 0xff
            val ahAl = b(p + 3 + 2 * ns) & 0xff
            val ah = ahAl >>> 4
            val al = ahAl & 0x0f
            if (ssv > 63 || sev > 63 || sev < ssv || ah > 13 || al > 13) return None
            if (ssv == 0 && sev != 0) return None // DC band is exactly [0, 0]
            if (ssv > 0 && ns != 1) return None // AC scans are non-interleaved
            if (ssv == 0 && ah == 0) {
              var i2 = 0
              while (i2 < ns) { if (dcTabs(dcSel(i2)) == null) return None; i2 += 1 }
            }
            if (ssv > 0 && acTabs(acSel(0)) == null) return None
            val r = new BitReader(b, end)
            val ok =
              if (ssv == 0)
                decodeDcScan(r, coefs, scanComp, dcSel.map(dcTabs), ah, al,
                  restartInterval, compSh, compSv, padW, usedW, usedH, mcusX, mcusY)
              else {
                val c0 = scanComp(0)
                decodeAcScan(r, coefs(c0), acTabs(acSel(0)), ssv, sev, ah, al,
                  restartInterval, usedW(c0), usedH(c0), padW(c0))
              }
            if (!ok) return None
            sawScan = true
            resumeAt = r.pos
          case _ => ()
        }
        o = resumeAt
      }
    }
    if (coefs == null) return None
    // dequantize + IDCT every used block of every component
    val planes = new Array[Array[Int]](nc)
    var c = 0
    while (c < nc) {
      val q = quant(compQuant(c))
      if (q == null) return None
      val plane = new Array[Int](compW(c) * compH(c))
      val cz = coefs(c)
      val coef = new Array[Double](64)
      val cw = compW(c)
      val chh = compH(c)
      var by = 0
      while (by < usedH(c)) {
        var bx = 0
        while (bx < usedW(c)) {
          val off = (by * padW(c) + bx) * 64
          var k = 0
          while (k < 64) {
            coef(Zigzag(k)) = cz(off + k).toDouble * q(Zigzag(k))
            k += 1
          }
          val block = idct(coef)
          var y = 0
          while (y < 8) {
            val py = by * 8 + y
            if (py < chh) {
              var x = 0
              while (x < 8) {
                val px = bx * 8 + x
                if (px < cw) plane(py * cw + px) = block(y * 8 + x)
                x += 1
              }
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      planes(c) = plane
      c += 1
    }
    Some((w, h, planes, compSh.take(nc), compSv.take(nc)))
  }
}
