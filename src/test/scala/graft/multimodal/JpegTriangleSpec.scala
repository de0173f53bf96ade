package graft.multimodal

import graft.SparkSpec

/** Pins JpegCodec.upsampleTriangle — the libjpeg-style fancy chroma
  * upsampler — on hand-computed vectors, plus its identity behavior on
  * constant planes (the oracle contract) and the full fancy decode on
  * a real non-constant-chroma stream.
  */
class JpegTriangleSpec extends SparkSpec {

  test("1D horizontal (4:2:2 shape): 3:1 weights with phase and edge clamp") {
    // chroma row [10, 50], rx=2 → output width 4:
    //  x=0 (even): near k=0, far k-1 clamped to 0 → (3·10 + 10 + 2)/4 = 10
    //  x=1 (odd):  near k=0, far k=1 → (3·10 + 50 + 2)/4 = 20 (82/4 → 20)
    //  x=2 (even): near k=1, far k=0 → (3·50 + 10 + 2)/4 = 40 (162/4 → 40)
    //  x=3 (odd):  near k=1, far k+1 clamped to 1 → (3·50 + 50 + 2)/4 = 50
    val out = JpegCodec.upsampleTriangle(Array(10, 50), cw = 2, ch = 1, rx = 2, ry = 1, w = 4, h = 1)
    assert(out.toSeq == Seq(10, 20, 40, 50), out.mkString(","))
  }

  test("2D (4:2:0): 9/3/3/1 over 16 with half-up rounding") {
    // plane [[0, 16], [32, 48]], output 4×4; pixel (1,1) (odd,odd):
    // near (0,0)=0 w9, right (1,0)=16 w3, down (0,1)=32 w3, diag (1,1)=48 w1
    // → (0 + 48 + 96 + 48 + 8)/16 = 200/16 = 12
    val plane = Array(0, 16, 32, 48)
    val out = JpegCodec.upsampleTriangle(plane, cw = 2, ch = 2, rx = 2, ry = 2, w = 4, h = 4)
    assert(out(1 * 4 + 1) == 12, s"inner pixel: ${out(5)}")
    // corner (0,0): all neighbors clamp to (0,0) → exactly 0
    assert(out(0) == 0)
    // corner (3,3): all clamp to (1,1) → 48
    assert(out(3 * 4 + 3) == 48)
    // pixel (2,1): x even near kx=1 far kx=0; y odd near ky=0 far ky=1
    // → (9·16 + 3·0 + 3·48 + 1·32 + 8)/16 = (144+144+32+8)/16 = 328/16 = 20
    assert(out(1 * 4 + 2) == 20, s"(2,1): ${out(6)}")
  }

  test("constant planes are reproduced exactly (the gray-chroma oracle contract)") {
    for (v <- Seq(0, 1, 127, 128, 200, 255)) {
      val plane = Array.fill(6)(v)
      val out = JpegCodec.upsampleTriangle(plane, cw = 3, ch = 2, rx = 2, ry = 2, w = 6, h = 4)
      assert(out.forall(_ == v), s"constant $v must survive: ${out.distinct.mkString(",")}")
    }
  }

  test("fancy decode of a non-constant-chroma 4:2:0 stream: valid pixels, differs from replication") {
    // a red/blue split image has a real chroma gradient after the
    // encoder's box downsample — the triangle filter must smooth the
    // boundary differently from replication
    val w = 32; val h = 16
    val r = Array.tabulate(w * h)(i => if (i % w < w / 2) 200 else 20)
    val g = Array.fill(w * h)(60)
    val b = Array.tabulate(w * h)(i => if (i % w < w / 2) 30 else 220)
    val enc = JpegCodec.encodeColor420(w, h, r, g, b)
    val plain = JpegCodec.decodeRgbPixels(enc).get
    val fancy = JpegCodec.decodeRgbPixels(enc, fancyChroma = true).get
    assert(fancy._1 == w && fancy._2 == h)
    assert(fancy._3.forall(v => v >= 0 && v <= 255))
    assert(!fancy._3.sameElements(plain._3) || !fancy._5.sameElements(plain._5),
      "triangle must differ from replication on a chroma gradient")
    // and the two must agree AWAY from the chroma boundary (constant
    // chroma regions are filter-invariant): compare the left edge column
    (0 until h).foreach { y =>
      assert(fancy._3(y * w) == plain._3(y * w), s"left-edge row $y")
    }
  }
}
