package graft.multimodal

import graft.SparkSpec

/** Pins FlacCodec stereo: the four channel assignments, exact-cost
  * decorrelation choice, interleaved round-trips, and the 17-bit side
  * channel.
  */
class FlacStereoSpec extends SparkSpec {

  private def rng(seed: Long): () => Int = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 65536L).toInt - 32768 }
  }

  /** Channel assignment nibble of the FIRST frame: the frame starts at
    * byte 42 (4 fLaC + 4 block header + 34 STREAMINFO); its header is
    * 14+1+1+4+4 = 24 bits of sync/flags/codes, so the 4 assignment
    * bits are the high nibble of byte 45.
    */
  private def firstFrameAssignment(b: Array[Byte]): Int = (b(45) & 0xf0) >> 4

  test("independent random channels round-trip interleaved, md5 verified, channels=2") {
    val r = rng(7L)
    val n = 512
    val left = Array.fill(n)(r())
    val right = Array.fill(n)(r())
    val enc = FlacCodec.encodeStereo(left, right, 44100, blockSize = 256)
    val d = FlacCodec.decode(enc).get
    assert(d.channels == 2 && d.bitsPerSample == 16 && d.sampleRate == 44100)
    assert(d.md5Ok, "stream MD5 over interleaved PCM must verify")
    assert(d.samples.length == 2 * n)
    (0 until n).foreach { i =>
      assert(d.samples(2 * i) == left(i) && d.samples(2 * i + 1) == right(i), s"sample $i")
    }
    // uncorrelated full-range noise: decorrelation buys nothing
    assert(firstFrameAssignment(enc) == 1, "independent must win on uncorrelated noise")
  }

  test("near-identical channels pick a side assignment and beat independent coding") {
    val n = 512
    val left = Array.tabulate(n)(i => (math.sin(i * 0.05) * 12000).toInt)
    val right = Array.tabulate(n)(i => left(i) + (i % 5) - 2) // side in [-2, 2]
    val enc = FlacCodec.encodeStereo(left, right, 16000, blockSize = 512)
    val asgn = firstFrameAssignment(enc)
    assert(asgn == 8 || asgn == 9 || asgn == 10, s"decorrelation must win, got $asgn")
    val d = FlacCodec.decode(enc).get
    assert(d.md5Ok && d.samples.length == 2 * n)
    (0 until n).foreach { i =>
      assert(d.samples(2 * i) == left(i) && d.samples(2 * i + 1) == right(i), s"sample $i")
    }
    // a tiny side channel must compress far below two independent
    // channels of the same content
    val indepSize = FlacCodec.encodeStereo(left, left.map(-_), 16000, 512).length
    assert(enc.length < n * 4, s"decorrelated stream ${enc.length} must beat raw ${n * 4}")
  }

  test("inverted channels (r = -l): mid collapses to parity, round-trip exact on odd sums") {
    // l odd → l + r = 0 is even, but mid = 0 and side = 2l exercises
    // the (sum | parity) reconstruction; add an asymmetric DC so sums
    // go odd too
    val n = 256
    val left = Array.tabulate(n)(i => 101 + ((i * 37) % 251))
    val right = left.map(v => -v + 1) // sum = 1 (odd) everywhere
    val enc = FlacCodec.encodeStereo(left, right, 8000, blockSize = 256)
    val d = FlacCodec.decode(enc).get
    assert(d.md5Ok)
    (0 until n).foreach { i =>
      assert(d.samples(2 * i) == left(i) && d.samples(2 * i + 1) == right(i), s"sample $i")
    }
  }

  test("17-bit side channel: extreme opposite rails survive (L-R = ±65535)") {
    val left = Array.tabulate(64)(i => if (i % 2 == 0) 32767 else -32768)
    val right = left.map(v => if (v == 32767) -32768 else 32767)
    val enc = FlacCodec.encodeStereo(left, right, 8000, blockSize = 64)
    val d = FlacCodec.decode(enc).get
    assert(d.md5Ok)
    (0 until 64).foreach { i =>
      assert(d.samples(2 * i) == left(i) && d.samples(2 * i + 1) == right(i), s"sample $i")
    }
  }

  test("multi-frame stereo: per-frame assignment choice, sequential numbering") {
    val n = 300 // 4 frames at blockSize 96: 96+96+96+12
    val id = 3L // id%3==0: tracking right channel
    val left = Array.tabulate(n)(i => Multimodal.flacSample(id, i))
    val right = Array.tabulate(n)(i => Multimodal.flacRightSample(id, i))
    val enc = FlacCodec.encodeStereo(left, right, 16000, blockSize = 96)
    val d = FlacCodec.decode(enc).get
    assert(d.md5Ok && d.samples.length == 2 * n)
    (0 until n).foreach { i =>
      assert(d.samples(2 * i) == left(i) && d.samples(2 * i + 1) == right(i), s"sample $i")
    }
  }

  test("hostile bytes: corruption anywhere in a stereo stream -> None, never garbage") {
    val left = Array.tabulate(128)(i => (i * 31) % 4001 - 2000)
    val right = left.map(v => v + 2)
    val enc = FlacCodec.encodeStereo(left, right, 16000, blockSize = 128)
    // flip one bit in every byte position across the stream. Flips in
    // the 42 metadata-header bytes may legitimately decode (ignored
    // min/max size fields) or surface as md5Ok=false (MD5 bytes); a
    // flip ANYWHERE in the frame region must be caught by CRC-8/CRC-16
    // — and no survivor may ever silently change the PCM with
    // md5Ok=true
    val orig = FlacCodec.decode(enc).get
    enc.indices.foreach { p =>
      val mut = enc.clone()
      mut(p) = (mut(p) ^ 0x10).toByte
      FlacCodec.decode(mut) match {
        case None => ()
        case Some(d) =>
          assert(p < 42, s"flip at frame byte $p must fail a CRC, not decode")
          if (d.md5Ok) assert(d.samples.sameElements(orig.samples), s"byte $p silent corruption")
      }
    }
  }
}
