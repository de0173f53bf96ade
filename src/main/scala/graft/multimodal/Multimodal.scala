package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 rows 31-32): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature-extraction as BATCHED
  * per-partition kernels.
  *
  * The HEADER decode is real byte parsing of the public PNG and
  * JPEG/JFIF formats ([[parseImageMeta]]); the corpus has no true media
  * files, so [[synthImages]] synthesizes payloads with VALID headers
  * (deterministic dimensions) that round-trip through the parser — the
  * oracle predicts the parsed values arithmetically. Feature
  * EXTRACTION (pixels → vectors) remains stubbed (`decodeStub`,
  * `frameEmbedding`): this container has no image/audio libraries.
  * Everything around the kernels — binary schema, batch shape,
  * partition-level iteration — is the production shape.
  */
object Multimodal {

  /** Attach a binary payload column (here derived from text — the test
    * corpus has no true media column; at 100 TB this is your parquet
    * `binary` column read as-is).
    */
  def withBinary(df: DataFrame, srcCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, encode(col(srcCol), "UTF-8"))

  /** Fan the tiny synthesis id frame out to the session's full
    * parallelism before a CPU-HEAVY per-row codec map. The synthetic
    * id frame reads as ONE parquet split (a few KB), which would pin
    * the whole encode pass on one core (measured: mm_audio_flac_stereo
    * spent ~1.4 s of single-threaded encode on a 32-core host); a
    * round-robin exchange of 8-byte id rows is free by comparison.
    *
    * SELECTIVE (r13 bench adjudication): the exchange carries a ~0.2 s
    * fixed stage cost locally, so only the genuinely expensive encoders
    * use it — FLAC (rice planning × all candidates), the entropy-coded
    * JPEG color/4:2:0 paths, and zlib PNG (measured wins 1.4-5×). The
    * cheap writers (headers, BMP/WAV byte layout, uncompressed Y4M,
    * gray JPEG on constant tiles) stay on the input partitioning where
    * the exchange costs more than it buys. Harness-side only either
    * way: production DECODE scans read naturally-split payload storage
    * and inherit its parallelism — the stats/parse kernels stay
    * map-only.
    */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG dimensions from the IHDR chunk (PNG spec, public: 8-byte
    * signature, then the IHDR chunk whose 13-byte data starts with
    * width/height as big-endian uint32). None for non-PNG/truncated
    * bytes; CRCs are not verified (header parse, not integrity check).
    */
  def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG dimensions from the first SOF marker (ITU T.81 §B.2.2,
    * public): walk the marker segments from SOI, skipping non-SOF
    * segments by their big-endian length; SOFn (C0–CF except C4/C8/CC)
    * payload is precision(1), height(2), width(2). None for non-JPEG,
    * truncated, or SOF-less bytes.
    */
  def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var o = 2
    while (o + 3 < b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      val marker = b(o + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / start-of-scan: no SOF seen
      val len = be16(b, o + 2)
      if (len < 2 || o + 2 + len > b.length) return None
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (len < 7) return None
        return Some((be16(b, o + 7), be16(b, o + 5))) // (width, height)
      }
      o += 2 + len
    }
    None
  }

  /** Real header decode: (format, width, height) — nulls when the
    * bytes are neither a parseable PNG nor JPEG.
    */
  def parseImageMeta(b: Array[Byte]): (String, Integer, Integer) =
    parsePng(b) match {
      case Some((w, h)) => ("png", w, h)
      case None => parseJpeg(b) match {
        case Some((w, h)) => ("jpeg", w, h)
        case None         => (null, null, null)
      }
    }

  /** A VALID minimal PNG: signature + IHDR (8-bit RGB, zero CRC — the
    * parser reads fields, not checksums) + empty IEND. 45 bytes.
    */
  def synthPng(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(45)
    out.write(PngSig, 0, 8)
    def w32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    w32(13); out.write("IHDR".getBytes("US-ASCII"))
    w32(width); w32(height)
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0) // depth, color, comp, filter, interlace
    w32(0) // CRC (unverified)
    w32(0); out.write("IEND".getBytes("US-ASCII")); w32(0)
    out.toByteArray
  }

  /** A VALID minimal JPEG: SOI, APP0/JFIF, SOF0 (1 component), EOI —
    * 35 bytes; the parser must skip APP0 to reach SOF0.
    */
  def synthJpeg(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(35)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
    w8(0xff); w8(0xd8) // SOI
    w8(0xff); w8(0xe0); w16(16) // APP0, len 16
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0) // version, units, densities, thumb
    w8(0xff); w8(0xc0); w16(11) // SOF0, len 11
    w8(8); w16(height); w16(width); w8(1) // precision, dims, 1 component
    w8(1); w8(0x11); w8(0) // component id, sampling, quant table
    w8(0xff); w8(0xd9) // EOI
    out.toByteArray
  }

  /** Deterministic synthesized image payloads (the corpus has no real
    * media): even ids get PNG, odd ids JPEG, dimensions pure arithmetic
    * in the id so the oracle can predict what the parser must recover.
    * Batched mapPartitions — the same shape a real encoder/transcoder
    * stage runs in.
    */
  def synthImages(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val w = 16 + (id % 1000L).toInt
        val h = 16 + ((id * 7L + 13L) % 1000L).toInt
        Row(id, if (id % 2 == 0) synthPng(w, h) else synthJpeg(w, h))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** WAV/RIFF audio header parse (public format: RIFF container,
    * little-endian chunk sizes; "fmt " carries channels/sample-rate/
    * bits, "data" carries the sample bytes). Walks the chunk list —
    * unknown chunks are skipped by their declared size — and returns
    * (channels, sampleRate, bitsPerSample, nSamples) with nSamples =
    * dataSize / blockAlign. None for non-WAV/truncated/fmt-less bytes.
    */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def tag(o: Int, s: String): Boolean =
      o + 4 <= b.length && (0 until 4).forall(i => b(o + i) == s.charAt(i).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataSize = -1L
    while (o + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val size = le32(b, o + 4).toLong & 0xffffffffL
      if (tag(o, "fmt ")) {
        if (size < 16 || o + 8 + 16 > b.length) return None
        if (!pcmFmtCoherent(b, o)) return None
        fmt = Some((le16(b, o + 10), le32(b, o + 12), le16(b, o + 22), le16(b, o + 20)))
      } else if (tag(o, "data")) dataSize = size
      // chunks are word-aligned; Long arithmetic guards hostile declared
      // sizes (>= 2^31 would make size.toInt negative: a stuck or
      // backwards walk). A chunk claiming past the buffer ends the walk —
      // whatever was captured so far still counts (a final unpadded
      // chunk is legal RIFF).
      val advance = 8L + size + (size & 1L)
      if (o + advance > b.length) o = b.length else o += advance.toInt
    }
    fmt match {
      case Some((ch, rate, bits, block)) if dataSize >= 0 && block > 0 =>
        Some((ch, rate, bits, dataSize / block))
      case _ => None
    }
  }

  /** fmt-chunk COHERENCE gate shared by both WAV parsers (found by
    * CodecFuzzSpec r17: a random byte flip in fmt yielded
    * channels=16386 passed through as "sane" metadata). A PCM fmt
    * chunk is internally redundant — blockAlign and byteRate are
    * DERIVED fields — so corruption that touches any of the six
    * numbers breaks the arithmetic with high probability. Accepts
    * exactly: format=1 (PCM), channels ≥ 1, bits ∈ {8,16,24,32},
    * rate ≥ 1, blockAlign = channels·bits/8, byteRate = rate·blockAlign.
    * `o` is the chunk start (the "fmt " tag offset); caller has
    * bounds-checked o+8+16.
    */
  private def pcmFmtCoherent(b: Array[Byte], o: Int): Boolean = {
    val format = le16(b, o + 8)
    val ch = le16(b, o + 10)
    val rate = le32(b, o + 12)
    val byteRate = le32(b, o + 16)
    val block = le16(b, o + 20)
    val bits = le16(b, o + 22)
    format == 1 && ch >= 1 && rate >= 1 &&
      (bits == 8 || bits == 16 || bits == 24 || bits == 32) &&
      block == ch * bits / 8 &&
      byteRate.toLong == rate.toLong * block
  }

  /** A VALID minimal WAV: RIFF/WAVE + a junk "LIST" chunk (the parser
    * must skip it), PCM "fmt ", and a zero-filled "data" chunk of
    * `nSamples` frames.
    */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Int): Array[Byte] = {
    val block = channels * bitsPerSample / 8
    val dataSize = nSamples * block
    val out = new java.io.ByteArrayOutputStream(12 + 12 + 24 + 8 + dataSize)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(4 + 12 + 24 + 8 + dataSize); tag("WAVE")
    tag("LIST"); w32(4); w32(0x4f464e49) // INFO, content-free — a skippable chunk
    tag("fmt "); w32(16)
    w16(1); w16(channels); w32(sampleRate) // PCM
    w32(sampleRate * block); w16(block); w16(bitsPerSample)
    tag("data"); w32(dataSize)
    var i = 0
    while (i < dataSize) { w8(0); i += 1 }
    out.toByteArray
  }

  /** Deterministic synthesized WAV payloads (id-derived parameters the
    * oracle predicts) through the same batched mapPartitions shape.
    */
  def synthAudio(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        Row(id, synthWav(
          channels = 1 + (id % 2L).toInt,
          sampleRate = 8000 + (id % 8L).toInt * 4000,
          bitsPerSample = 16,
          nSamples = 100 + (id % 400L).toInt))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The deterministic 16-bit PCM sample stream used by
    * [[synthAudioPcm]] and predicted by the mm_audio_stats oracle:
    * sample i of doc `id` is ((id·7 + i·13) mod 2001) − 1000 ∈
    * [−1000, 1000]. Pure integer arithmetic so every aggregate the
    * decoder computes is closed-form on both engines with no FP
    * ordering concerns.
    */
  def pcmSample(id: Long, i: Int): Int = (((id * 7L + i * 13L) % 2001L) - 1000L).toInt

  /** Synthesized mono 16-bit PCM WAVs whose sample DATA is the real
    * payload (unlike [[synthAudio]]'s zero-filled files): n_samples =
    * 100 + id mod 400, samples from [[pcmSample]], little-endian.
    */
  def synthAudioPcm(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val n = 100 + (id % 400L).toInt
        val base = synthWav(channels = 1, sampleRate = 16000, bitsPerSample = 16, nSamples = n)
        // overwrite the zero-filled data chunk with the real samples;
        // synthWav's layout ends with "data" + size + payload
        val dataOff = base.length - 2 * n
        var i = 0
        while (i < n) {
          val v = pcmSample(id, i)
          base(dataOff + 2 * i) = (v & 0xff).toByte
          base(dataOff + 2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        Row(id, base)
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL PCM sample decode: walk the RIFF chunks to the 16-bit data
    * payload and aggregate the ACTUAL decoded samples — integer sum /
    * sum-of-squares / min / max (exact on any engine, no FP ordering).
    * None for non-WAV, non-PCM-16, or truncated payloads.
    */
  def parseWavPcmStats(b: Array[Byte]): Option[(Int, Long, Long, Long, Long, Long)] = {
    def tag(o: Int, s: String): Boolean =
      o + 4 <= b.length && (0 until 4).forall(i => b(o + i) == s.charAt(i).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataOff = -1
    var dataSize = -1L
    while (o + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
      val size = le32(b, o + 4).toLong & 0xffffffffL
      if (tag(o, "fmt ")) {
        if (size < 16 || o + 8 + 16 > b.length) return None
        if (!pcmFmtCoherent(b, o)) return None
        fmt = Some((le16(b, o + 10), le32(b, o + 12), le16(b, o + 22)))
      } else if (tag(o, "data")) { dataOff = o + 8; dataSize = size }
      // same hostile-size guard as parseWav: never let a crafted 32-bit
      // size stall the walk or index backwards
      val advance = 8L + size + (size & 1L)
      if (o + advance > b.length) o = b.length else o += advance.toInt
    }
    fmt match {
      case Some((ch, rate, bits)) if dataOff >= 0 && bits == 16 &&
          dataOff + dataSize <= b.length =>
        val n = (dataSize / 2L).toInt // total 16-bit samples across channels
        var sum = 0L
        var sumSq = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var i = 0
        while (i < n) {
          // little-endian signed 16-bit
          val v = ((b(dataOff + 2 * i) & 0xff) | (b(dataOff + 2 * i + 1) << 8)).toShort.toLong
          sum += v
          sumSq += v * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        val _ = rate
        Some((ch, n.toLong, sum, sumSq, if (n == 0) 0L else mn, if (n == 0) 0L else mx))
      case _ => None
    }
  }

  /** Batched real PCM decode over a payload column: per-doc integer
    * sample statistics — nulls for unparseable payloads.
    */
  def audioPcmStats(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("sum_amp", LongType), StructField("sum_sq", LongType),
      StructField("min_amp", LongType), StructField("max_amp", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        parseWavPcmStats(r.getAs[Array[Byte]](pIdx)) match {
          case Some((_, n, sum, sumSq, mn, mx)) =>
            Row(r.getLong(idIdx), n, sum, sumSq, mn, mx)
          case None => Row(r.getLong(idIdx), null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched real WAV-header decode: (channels, sample_rate, bits,
    * n_samples) per payload — nulls for unparseable bytes.
    */
  def audioMeta(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("channels", LongType),
      StructField("sample_rate", LongType), StructField("bits", LongType),
      StructField("n_samples", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val parsed = parseWav(r.getAs[Array[Byte]](pIdx))
        parsed match {
          case Some((ch, rate, bits, ns)) =>
            Row(r.getLong(idIdx), ch.toLong, rate.toLong, bits.toLong, ns)
          case None => Row(r.getLong(idIdx), null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic sample for the FLAC corpus: a 17-per-step ramp
    * wrapping in [-2000, 2000] — mostly-linear segments make the FIXED
    * predictors genuinely win (near-constant order-1/2 residuals, so
    * the rice path carries real compression), while the wrap points
    * keep the residual stream non-trivial. Distinct from pcmSample so
    * the two audio paths cannot silently share an oracle.
    */
  def flacSample(id: Long, i: Int): Int = (((id * 11L + i * 17L) % 4001L) - 2000L).toInt

  /** Synthesized MULTI-FRAME FLAC streams (FlacCodec.encode, blocksize
    * 96 → 2-6 frames per doc, exercising the sequential UTF-8 frame
    * numbering and per-frame CRC chains) whose sample data is
    * [[flacSample]]: n = 100 + id mod 400, mono 16-bit at 16 kHz —
    * real rice-coded payloads with live CRC-8/CRC-16/MD5 integrity.
    */
  def synthFlacs(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val n = 100 + (id % 400L).toInt
        val samples = Array.tabulate(n)(i => flacSample(id, i))
        Row(id, FlacCodec.encode(samples, 16000, blockSize = 96))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Right channel for the stereo FLAC corpus, keyed so every frame
    * decorrelation mode genuinely wins somewhere: id%3==0 → right
    * tracks left within ±3 (side channel near-silent: left/side or
    * mid/side wins), id%3==1 → right = −left (mid collapses to the
    * parity floor: mid/side wins), id%3==2 → an independent walk
    * (decorrelation buys nothing: independent wins).
    */
  def flacRightSample(id: Long, i: Int): Int = (id % 3L) match {
    case 0L => flacSample(id, i) + (((id + i) % 7L) - 3L).toInt
    case 1L => -flacSample(id, i)
    case _  => (((id * 13L + i * 23L) % 4001L) - 2000L).toInt
  }

  /** Synthesized STEREO multi-frame FLAC streams: left channel is
    * [[flacSample]], right is [[flacRightSample]], encoded by
    * FlacCodec.encodeStereo with per-frame exact-cost channel
    * decorrelation (independent / left-side / right-side / mid-side).
    */
  def synthStereoFlacs(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val n = 100 + (id % 400L).toInt
        val left = Array.tabulate(n)(i => flacSample(id, i))
        val right = Array.tabulate(n)(i => flacRightSample(id, i))
        Row(id, FlacCodec.encodeStereo(left, right, 16000, blockSize = 96))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL compressed-audio decode: run the full FLAC bitstream parse
    * (rice decode, fixed-predictor reconstruction, CRC-8/CRC-16
    * verification, stream-MD5 check) and aggregate the ACTUAL decoded
    * samples — integer sum / sum-of-squares / min / max plus the MD5
    * verdict. Nulls for non-FLAC, out-of-subset, or corrupted
    * payloads (any failed integrity check ⇒ None, never garbage).
    */
  def flacPcmStats(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", LongType),
      StructField("sum_amp", LongType), StructField("sum_sq", LongType),
      StructField("min_amp", LongType), StructField("max_amp", LongType),
      StructField("md5_ok", BooleanType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        FlacCodec.decode(r.getAs[Array[Byte]](pIdx)) match {
          case Some(d) if d.samples.nonEmpty =>
            var sum = 0L; var sumSq = 0L
            var mn = Long.MaxValue; var mx = Long.MinValue
            var i = 0
            while (i < d.samples.length) {
              val v = d.samples(i).toLong
              sum += v; sumSq += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Row(r.getLong(idIdx), d.samples.length.toLong, sum, sumSq, mn, mx, d.md5Ok)
          case _ => Row(r.getLong(idIdx), null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched real-header decode over a binary column: one partition
    * pass, `batchSize` payloads per slab, (format, width, height,
    * n_bytes) per payload — nulls for unparseable bytes.
    */
  def imageMeta(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("format", StringType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("n_bytes", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val (fmt, w, h) = parseImageMeta(bytes)
        Row(r.getLong(idIdx), fmt,
          if (w == null) null else w.longValue(),
          if (h == null) null else h.longValue(),
          bytes.length.toLong)
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** A VALID uncompressed 24-bpp BMP (Windows BITMAPINFOHEADER — a
    * public format needing NO codec): 14-byte file header, 40-byte info
    * header, then bottom-up BGR pixel rows each padded to a 4-byte
    * stride. Pixel (x, y) carries channel values that are pure
    * arithmetic in (base, x, y):
    *   B = base + x + y,  G = base + 2x,  R = base + 3y
    * so an oracle can predict every per-channel statistic in closed
    * form. Caller guarantees base + max(2(w-1), 3(h-1)) ≤ 255.
    */
  def synthBmp(width: Int, height: Int, base: Int): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val dataSize = stride * height
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    w8('B'); w8('M'); w32(54 + dataSize); w32(0); w32(54) // file header: size, reserved, pixel offset
    w32(40); w32(width); w32(height) // info header; positive height = bottom-up
    w16(1); w16(24); w32(0); w32(dataSize) // planes, bpp, BI_RGB, image size
    w32(2835); w32(2835); w32(0); w32(0) // 72 DPI, palette counts
    var y = height - 1 // rows are stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        w8(base + x + y); w8(base + 2 * x); w8(base + 3 * y)
        x += 1
      }
      var p = 3 * width
      while (p < stride) { w8(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** REAL pixel decode of an uncompressed 24-bpp BMP: header fields
    * (offset, dims, bpp, compression) then a walk of the actual pixel
    * bytes — per-channel (b, g, r) mean/min/max over every pixel.
    * Handles bottom-up and top-down (negative height) rows; None for
    * non-BMP, compressed, non-24-bpp, or truncated payloads. Stats are
    * orientation-independent, but the walk still honors the row order
    * and stride so truncation is detected exactly.
    */
  def parseBmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Double], Array[Int], Array[Int])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return None
    val width = le32(b, 18)
    val rawH = le32(b, 22)
    val height = math.abs(rawH)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || height == 0 || bpp != 24 || compression != 0) return None
    val stride = ((3 * width + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * height > b.length) return None
    val sums = new Array[Double](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    var row = 0
    while (row < height) {
      var x = 0
      val ro = off + row * stride
      while (x < width) {
        var c = 0
        while (c < 3) {
          val v = b(ro + 3 * x + c) & 0xff
          sums(c) += v
          if (v < mins(c)) mins(c) = v
          if (v > maxs(c)) maxs(c) = v
          c += 1
        }
        x += 1
      }
      row += 1
    }
    val n = width.toDouble * height
    Some((width, height, sums.map(_ / n), mins, maxs))
  }

  /** Deterministic synthesized BMP payloads: dimensions and the pixel
    * base are pure arithmetic in the id (w, h ∈ [8, 16], base ∈ [0, 63]
    * — keeps every channel value ≤ 63 + 48 < 256) so the oracle can
    * predict the decoded statistics in closed form.
    */
  def synthBitmaps(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val w = 8 + (id % 9L).toInt
        val h = 8 + ((id * 5L + 3L) % 9L).toInt
        Row(id, synthBmp(w, h, (id % 64L).toInt))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched REAL pixel-content feature extraction (the upgrade of
    * `decodeStub` for a format this container can decode without any
    * media library): per-channel mean/min/max straight from the BMP
    * pixel bytes — nulls for unparseable payloads.
    */
  def bmpPixelStats(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", LongType),
      StructField("height", LongType),
      StructField("mean_b", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_r", DoubleType),
      StructField("min_b", LongType), StructField("max_b", LongType),
      StructField("min_g", LongType), StructField("max_g", LongType),
      StructField("min_r", LongType), StructField("max_r", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        parseBmpPixels(r.getAs[Array[Byte]](pIdx)) match {
          case Some((w, h, means, mins, maxs)) =>
            Row(r.getLong(idIdx), w.toLong, h.toLong,
              means(0), means(1), means(2),
              mins(0).toLong, maxs(0).toLong,
              mins(1).toLong, maxs(1).toLong,
              mins(2).toLong, maxs(2).toLong)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null, null,
              null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** A COMPLETE real PNG (public spec, no codec beyond JDK zlib):
    * signature, IHDR (8-bit RGB), IDAT = Deflater-compressed filtered
    * scanlines — filter type per row chosen by `filterOf` from the full
    * set {0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth} — split across TWO
    * IDAT chunks (decoders must concatenate), IEND; every chunk carries
    * its real CRC32. Pixel (x, y) channels are pure arithmetic:
    *   R = base + 3y,  G = base + 2x,  B = base + x + y
    * (the BMP contract with R and B swapped into PNG's RGB order) so an
    * oracle predicts every per-channel statistic in closed form. Caller
    * guarantees base + max(3(h−1), 2(w−1), (w−1)+(h−1)) ≤ 255.
    */
  def synthPngRgb(width: Int, height: Int, base: Int, filterOf: Int => Int): Array[Byte] = {
    val stride = 3 * width
    val raw = new Array[Byte](height * (1 + stride))
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        cur(3 * x) = base + 3 * y
        cur(3 * x + 1) = base + 2 * x
        cur(3 * x + 2) = base + x + y
        x += 1
      }
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"PNG filter type $f")
      val ro = y * (1 + stride)
      raw(ro) = f.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= 3) cur(i - 3) else 0
        val up = if (y > 0) prior(i) else 0
        val ul = if (y > 0 && i >= 3) prior(i - 3) else 0
        val filtered = f match {
          case 0 => cur(i)
          case 1 => cur(i) - left
          case 2 => cur(i) - up
          case 3 => cur(i) - ((left + up) >> 1)
          case _ => cur(i) - paethPredict(left, up, ul)
        }
        raw(ro + 1 + i) = (filtered & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    // zlib stream via the public JDK Deflater
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val zBuf = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(zBuf, 0, defl.deflate(zBuf))
    defl.end()
    val z = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream(64 + z.length)
    out.write(PngSig, 0, 8)
    def w32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def chunk(typ: String, data: Array[Byte], from: Int, len: Int): Unit = {
      w32(len)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, from, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb, 0, 4); crc.update(data, from, len)
      w32(crc.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    def p32(o: Int, v: Int): Unit = { ihdr(o) = (v >>> 24).toByte; ihdr(o + 1) = (v >>> 16).toByte; ihdr(o + 2) = (v >>> 8).toByte; ihdr(o + 3) = v.toByte }
    p32(0, width); p32(4, height)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit depth, color type 2 (truecolor RGB)
    chunk("IHDR", ihdr, 0, 13)
    val half = math.max(1, z.length / 2)
    chunk("IDAT", z, 0, half)
    if (z.length > half) chunk("IDAT", z, half, z.length - half)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  /** PNG spec §9.4 Paeth predictor (public). */
  private def paethPredict(left: Int, up: Int, ul: Int): Int = {
    val p = left + up - ul
    val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
    if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
  }

  /** REAL pixel decode of a complete 8-bit RGB PNG: chunk walk (IDAT
    * chunks concatenated), JDK-Inflater zlib decompress, then
    * per-scanline reconstruction of all five PNG filter types, walking
    * the ACTUAL decoded pixel bytes for per-channel (r, g, b)
    * mean/min/max. None — never a crash or a stuck loop — for non-PNG,
    * non-8-bit-RGB, interlaced, truncated, or corrupt-zlib payloads and
    * for hostile chunk lengths. CRCs are not verified (content decode,
    * not integrity audit).
    */
  def parsePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Double], Array[Int], Array[Int])] = {
    if (b.length < 8 || !PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    var o = 8
    var w = -1
    var h = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && o + 8 <= b.length) {
      val len = be32(b, o)
      // hostile/truncated declared length: be32 < 0 or past the buffer
      if (len < 0 || o + 12L + len > b.length) return None
      val isType = (s: String) => (0 until 4).forall(i => b(o + 4 + i) == s.charAt(i).toByte)
      if (isType("IHDR")) {
        if (len < 13) return None
        w = be32(b, o + 8); h = be32(b, o + 12)
        val depth = b(o + 16) & 0xff
        val color = b(o + 17) & 0xff
        val interlace = b(o + 20) & 0xff
        if (depth != 8 || color != 2 || interlace != 0) return None
        sawIhdr = true
      } else if (isType("IDAT")) idat.write(b, o + 8, len)
      else if (isType("IEND")) done = true
      o += 12 + len
    }
    if (!sawIhdr || w <= 0 || h <= 0 || idat.size == 0) return None
    // LONG arithmetic before any allocation: a hostile IHDR width up
    // to 2^31−1 overflows `3*w` in int, flipping the size guard's sign
    // and passing a negative rawLen to the allocator (found by
    // CodecFuzzSpec's 25k-case sweep, r17)
    if (w > (1 << 24) || h > (1 << 24) || 3L * w * h + h > Int.MaxValue) return None
    val stride = 3 * w
    val rawLen = h * (1 + stride)
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var filled = 0
      while (filled < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, filled, rawLen - filled)
        filled += n
        if (n == 0 && !inf.finished()) return None // truncated/dictionary stream
      }
      if (filled != rawLen) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    val sums = new Array[Double](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    var y = 0
    while (y < h) {
      val ro = y * (1 + stride)
      val f = raw(ro) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val x = raw(ro + 1 + i) & 0xff
        val left = if (i >= 3) cur(i - 3) else 0
        val up = if (y > 0) prior(i) else 0
        val ul = if (y > 0 && i >= 3) prior(i - 3) else 0
        val rec = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case _ => x + paethPredict(left, up, ul)
        }
        val v = rec & 0xff
        cur(i) = v
        val c = i % 3
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val n = w.toDouble * h
    Some((w, h, sums.map(_ / n), mins, maxs))
  }

  /** Deterministic synthesized COMPLETE PNGs: dimensions and pixel base
    * arithmetic in the id (the synthBitmaps contract, so channel values
    * stay ≤ 63 + 45 < 256); the filter type of row y is (id + y) mod 5 —
    * every payload mixes filter types and the corpus covers all five.
    */
  def synthPngs(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val w = 8 + (id % 9L).toInt
        val h = 8 + ((id * 5L + 3L) % 9L).toInt
        Row(id, synthPngRgb(w, h, (id % 64L).toInt, y => ((id + y) % 5L).toInt))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched REAL compressed-image pixel decode (the PNG upgrade of
    * [[bmpPixelStats]]): inflate + defilter + walk the actual pixels —
    * per-channel mean/min/max in PNG's RGB order, nulls for
    * unparseable payloads.
    */
  def pngPixelStats(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", LongType),
      StructField("height", LongType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("min_r", LongType), StructField("max_r", LongType),
      StructField("min_g", LongType), StructField("max_g", LongType),
      StructField("min_b", LongType), StructField("max_b", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        parsePngPixels(r.getAs[Array[Byte]](pIdx)) match {
          case Some((w, h, means, mins, maxs)) =>
            Row(r.getLong(idIdx), w.toLong, h.toLong,
              means(0), means(1), means(2),
              mins(0).toLong, maxs(0).toLong,
              mins(1).toLong, maxs(1).toLong,
              mins(2).toLong, maxs(2).toLong)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null, null,
              null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized COMPLETE baseline JPEGs: a grid of
    * constant 8×8 tiles — tile (bx, by) is gray
    * (id·7 + bx·31 + by·17) mod 256 — run through the REAL JpegCodec
    * encoder (FDCT, quantization, Annex K Huffman coding). Constant
    * tiles survive the DCT round-trip exactly (see JpegCodec), so the
    * oracle predicts every decoded pixel in closed form while the
    * payloads still exercise the full entropy machinery: DC prediction
    * deltas span ±255 (all amplitude categories), per-block EOBs,
    * stuffed 0xFF bytes. `restartInterval` > 0 additionally writes DRI
    * + an RSTn marker every that-many MCUs (predictor resets, marker
    * cycling, byte-edge padding) — the error-resilience layout real
    * crawl JPEGs ship with.
    */
  def synthJpegs(df: DataFrame, idCol: String, batchSize: Int = 64,
      restartInterval: Int = 0): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val bw = 1 + (id % 3L).toInt
        val bh = 1 + ((id * 5L + 3L) % 3L).toInt
        val w = 8 * bw
        val h = 8 * bh
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = ((id * 7L + (x / 8) * 31L + (y / 8) * 17L) % 256L).toInt
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeGray(w, h, pix, restartInterval))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched REAL DCT-compressed-image pixel decode (the JPEG upgrade
    * of [[pngPixelStats]]): Huffman entropy decode + dequant + IDCT,
    * walking the ACTUAL decoded gray pixels — integer sum/min/max and
    * the double mean — nulls for unparseable payloads.
    */
  def jpegPixelStats(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", LongType),
      StructField("height", LongType),
      StructField("sum_gray", LongType), StructField("mean_gray", DoubleType),
      StructField("min_gray", LongType), StructField("max_gray", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        JpegCodec.decodeGrayPixels(r.getAs[Array[Byte]](pIdx)) match {
          case Some((w, h, pix)) =>
            var s = 0L
            var mn = 255L
            var mx = 0L
            var i = 0
            while (i < pix.length) {
              val v = pix(i)
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Row(r.getLong(idIdx), w.toLong, h.toLong, s,
              s.toDouble / (w.toLong * h), mn, mx)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized COMPLETE baseline COLOR JPEGs (3
    * components, 4:4:4, interleaved MCUs): gray-content constant tiles
    * — tile (bx, by) has R=G=B = (id·11 + bx·29 + by·23) mod 256 — so
    * the JFIF transform lands on Y=tile/Cb=Cr=128 exactly and the
    * round-trip is bit-exact per channel (JpegCodecSpec pins it), while
    * every payload exercises the chroma table ids and the interleaved
    * per-component DC predictors.
    */
  def synthJpegColors(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val bw = 1 + ((id * 3L + 1L) % 3L).toInt
        val bh = 1 + ((id * 7L + 2L) % 3L).toInt
        val w = 8 * bw
        val h = 8 * bh
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = ((id * 11L + (x / 8) * 29L + (y / 8) * 23L) % 256L).toInt
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeColor(w, h, pix, pix, pix))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized PROGRESSIVE (SOF2) grayscale JPEGs —
    * the [[synthJpegs]] constant-tile contract (tile (bx, by) is gray
    * (id·13 + bx·37 + by·19) mod 256) through
    * [[JpegCodec.encodeGrayProgressive]]'s six-scan successive-
    * approximation script: DC split across two bit-planes, AC across
    * two spectral bands at Al=2 plus two refinement passes, cross-block
    * EOBn runs throughout (every all-zero AC band folds into one). The
    * closed-form oracle carries over because progressive accumulation
    * to Al=0 reconstructs exactly the baseline coefficients.
    */
  def synthJpegProgs(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val bw = 1 + ((id * 2L + 1L) % 3L).toInt
        val bh = 1 + ((id * 3L + 2L) % 3L).toInt
        val w = 8 * bw
        val h = 8 * bh
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = ((id * 13L + (x / 8) * 37L + (y / 8) * 19L) % 256L).toInt
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeGrayProgressive(w, h, pix))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized PROGRESSIVE COLOR JPEGs (SOF2, 4:4:4,
    * ten scans: interleaved DC first/refine + per-component spectral
    * AC bands and refinements): gray-content constant tiles — tile
    * (bx, by) has R=G=B = (id·19 + bx·43 + by·29) mod 256 — so the
    * JFIF transform lands on Y=tile/Cb=Cr=128 exactly and the
    * per-channel closed form of the color oracle carries over.
    */
  def synthJpegProgColors(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val bw = 1 + ((id * 5L + 2L) % 3L).toInt
        val bh = 1 + ((id * 11L + 1L) % 3L).toInt
        val w = 8 * bw
        val h = 8 * bh
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = ((id * 19L + (x / 8) * 43L + (y / 8) * 29L) % 256L).toInt
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeColorProgressive(w, h, pix, pix, pix))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized 4:2:0 CHROMA-SUBSAMPLED baseline JPEGs —
    * the dominant real-corpus layout (16×16 MCUs: four Y blocks + one
    * Cb + one Cr from half-resolution planes): gray-content constant
    * 8×8 tiles — tile (bx, by) has R=G=B = (id·13 + bx·19 + by·37) mod
    * 256 — so Y is tile-constant and Cb=Cr=128 everywhere, which
    * survives BOTH the 2×2 box downsample (average of four 128s) and
    * the DCT round-trip exactly; the per-channel closed-form oracle of
    * the 4:4:4 color path carries over unchanged while the payloads
    * exercise the full multi-block-MCU machinery (per-MCU Y DC
    * prediction chains, subsampled chroma planes, upsampling).
    */
  def synthJpeg420s(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        // dims in 16px MCU units (1-2 each) → 8px tile grid is 2·mw × 2·mh
        val mw = 1 + (id % 2L).toInt
        val mh = 1 + ((id * 3L + 1L) % 2L).toInt
        val w = 16 * mw
        val h = 16 * mh
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = ((id * 13L + (x / 8) * 19L + (y / 8) * 37L) % 256L).toInt
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeColor420(w, h, pix, pix, pix))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched REAL color-JPEG pixel decode: interleaved 3-component
    * entropy decode + IDCT + YCbCr→RGB, walking the ACTUAL decoded
    * pixels — per-channel integer sum/min/max, nulls for unparseable
    * payloads.
    */
  def jpegColorPixelStats(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64, fancyChroma: Boolean = false): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", LongType),
      StructField("height", LongType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("min_r", LongType), StructField("max_r", LongType),
      StructField("min_b", LongType), StructField("max_b", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        JpegCodec.decodeRgbPixels(r.getAs[Array[Byte]](pIdx), fancyChroma) match {
          case Some((w, h, rp, gp, bp)) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var mnr = 255L; var mxr = 0L; var mnb = 255L; var mxb = 0L
            var i = 0
            while (i < rp.length) {
              sr += rp(i); sg += gp(i); sb += bp(i)
              if (rp(i) < mnr) mnr = rp(i)
              if (rp(i) > mxr) mxr = rp(i)
              if (bp(i) < mnb) mnb = bp(i)
              if (bp(i) > mxb) mxb = bp(i)
              i += 1
            }
            Row(r.getLong(idIdx), w.toLong, h.toLong, sr, sg, sb, mnr, mxr, mnb, mxb)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private val stubSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feat", ArrayType(FloatType))))

  /** Batched per-partition "decoder": pulls `batchSize` payloads at a
    * time (the shape a GPU/native decoder wants), emits a fixed-width
    * float feature vector per payload. The ??? -equivalent decode is
    * `fakeFeature` — clearly-marked deterministic stand-in.
    */
  def decodeStub(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real impl: hand `batch.map(_.getAs[Array[Byte]](pIdx))` to the
        // native decoder in one call; here: deterministic fake features.
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](pIdx)
          Row(r.getLong(idIdx), bytes.length, fakeFeature(bytes))
        }
      }
    }(org.apache.spark.sql.Encoders.row(stubSchema))
  }

  /** STUB: stands in for image/audio feature extraction. */
  private def fakeFeature(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](4)
    var i = 0
    while (i < bytes.length) { out(i % 4) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    out
  }

  /** Deterministic pseudo-embedding from per-frame content hashes:
    * dimension j is the scaled 60-bit hash of frame j's md5 — a
    * SQL-twinnable stand-in for a real visual/audio encoder. The
    * surrounding plumbing (fixed-width float vector per payload,
    * flowing into LSH buckets / cosine top-k) is the production
    * multimodal-similarity shape; swap the hash for an encoder call
    * and nothing downstream changes.
    */
  def frameEmbedding(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      dims: Int,
      frameChars: Int): DataFrame = {
    val es = (0 until dims).map { j =>
      val fm = md5(col(srcCol).substr(lit(j * frameChars + 1), lit(frameChars)))
      val h = conv(substring(fm, 1, 15), 16, 10).cast("long")
      ((pmod(h, lit(10001L)).cast("double") / 10000.0) - 0.5).cast("float").as(s"e$j")
    }
    df.select(col(idCol) +: es: _*)
  }

  /** Scene segmentation over the frame stream: a new scene starts
    * whenever the frame content hash differs from the previous frame's
    * — the shot-boundary-detection shape over opaque frame payloads
    * (swap the md5 for a perceptual hash or embedding distance and
    * nothing downstream changes). Per-doc rollup: frame count, scene
    * count, longest scene run. One window pass over (doc, frame_idx)
    * for the boundary marks + running scene id, then two partial-agg
    * groupBys (scene sizes, doc rollup) — all integer aggregates, so
    * cross-engine equality is exact by construction.
    */
  def sceneStats(df: DataFrame, idCol: String, srcCol: String, frameChars: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = sampleFrames(df, idCol, srcCol, frameChars, every = 1)
    val w = Window.partitionBy(idCol).orderBy("frame_idx")
    val prev = lag(col("frame_md5"), 1).over(w)
    val marked = frames.withColumn("__new",
      when(prev.isNull || prev =!= col("frame_md5"), 1L).otherwise(0L))
    val withScene = marked.withColumn("__scene",
      sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withScene.groupBy(col(idCol), col("__scene")).agg(count(lit(1)).as("__len"))
      .groupBy(idCol).agg(
        sum(col("__len")).as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max(col("__len")).as("longest_scene"))
  }

  /** Fixed-width frame sampling over a payload, every `every`-th frame
    * — the video-frame-subsampling shape as pure relational ops
    * (sequence + explode + substr), no UDF.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      frameChars: Int,
      every: Int): DataFrame = {
    // ONE kernel byte pass per payload (plans.FrameMd5Kernel) replaces
    // the sequence-explode + md5(substr(...)) chain, whose per-frame
    // substr re-walked the payload from byte 0 to find its char offset
    // — O(len²/frameChars) per doc (the SpanHash60 lesson). Identical
    // output rows: kept frame indices are exactly the multiples of
    // `every` (frame_idx = pos·every), hex strings byte-equal to
    // md5(), an EMPTY payload still yields zero frames (empty array →
    // posexplode emits nothing — no phantom md5('')).
    df.select(col(idCol),
        posexplode(graft.plans.TextHashKernels.frameMd5(col(srcCol), frameChars, every))
          .as(Seq("__pos", "frame_md5")))
      .select(col(idCol), (col("__pos").cast("bigint") * every).as("frame_idx"),
        col("frame_md5"))
  }

  /** Cross-document FRAME-level near-dup detection — the video-dedup
    * composition: a re-upload or clip re-post shares frames with the
    * original even when doc-level dedup misses it, so count, per doc,
    * how many of its frames' hashes appear in MORE THAN ONE distinct
    * document anywhere in the corpus.
    *
    * Scale shape (the substringDupStats pattern): only
    * (doc_id, 16-byte frame hash) rows shuffle, never frame content;
    * the distinct (doc, hash) projection collapses within-doc repeats
    * map-side, the per-hash document count partial-aggregates a
    * corpus-hot intro/outro frame to one row per task before its
    * exchange, and the join back is AQE-skew-splittable. The per-doc
    * rollup is one partial-agg groupBy.
    */
  def frameDupStats(df: DataFrame, idCol: String, srcCol: String,
      frameChars: Int): DataFrame = {
    // PERSISTED: the hash frame feeds both the per-hash doc-frequency
    // rollup and the join back — without the cache the whole
    // frame-hash pass (at scale: the video decode feeding it) runs
    // twice (the ngramJaccardPairs precedent; blocks freed by the
    // ContextCleaner / per-query cache hygiene)
    val docHash = sampleFrames(df, idCol, srcCol, frameChars, every = 1)
      .select(col(idCol), col("frame_md5"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = docHash.distinct()
      .groupBy(col("frame_md5")).agg(count(lit(1)).as("__nd"))
    docHash.join(freq, Seq("frame_md5"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("share_frac",
        col("n_shared").cast("double") / col("n_frames").cast("double"))
  }

  // ---- real video frames: Y4M (YUV4MPEG2) ----------------------------

  /** Y4M synthesis pixel contract — every plane value is closed-form
    * arithmetic in (doc_id, frame, x, y), so the DuckDB oracle
    * predicts the decoded statistics exactly (the BMP contract of
    * [[synthBitmaps]], lifted to a multi-frame video container):
    *  - dims: w = 8 + 4·(id%4), h = 8 + 4·((3·id+1)%4)   (even, ≤ 20)
    *  - frames: nf = 2 + id%6
    *  - scene structure: a CUT lands at frame f>0 iff (id+f)%4 == 0;
    *    s(f) = number of cuts ≤ f (the scene id)
    *  - luma  Y(x,y,f)  = (id%64) + x + 2y + 10·s(f) + (f%2) — scenes
    *    jump the base by 10 while consecutive in-scene frames differ
    *    by exactly |±1| per pixel (the f%2 dither), so REAL
    *    frame-content shot detection has a crisp margin: mean |ΔY| is
    *    exactly 1 within a scene and 9 or 11 across a cut
    *  - chroma Cb(cx,cy,f) = 64 + cx + 2·cy + 3·f,
    *           Cr(cx,cy,f) = 160 − cx − cy − 2·f    (half-res planes)
    * All values stay in [0, 255] by construction (no wraparound — the
    * closed forms hold exactly).
    */
  def y4mLuma(id: Long, f: Int, x: Int, y: Int, sceneId: Int): Int =
    ((id % 64L).toInt + x + 2 * y + 10 * sceneId + (f % 2))
  def y4mSceneId(id: Long, f: Int): Int = {
    var s = 0
    var i = 1
    while (i <= f) { if ((id + i) % 4L == 0L) s += 1; i += 1 }
    s
  }

  /** Synthesized multi-frame C420jpeg Y4M streams per id (contract in
    * [[y4mLuma]]). Real container bytes through [[Y4mCodec.write]].
    */
  def synthY4ms(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val w = 8 + 4 * (id % 4L).toInt
        val h = 8 + 4 * ((3 * id + 1) % 4L).toInt
        val nf = 2 + (id % 6L).toInt
        val cw = w / 2
        val ch = h / 2
        val frames = (0 until nf).map { f =>
          val s = y4mSceneId(id, f)
          val y = new Array[Byte](w * h)
          var yy = 0
          while (yy < h) {
            var x = 0
            while (x < w) { y(yy * w + x) = y4mLuma(id, f, x, yy, s).toByte; x += 1 }
            yy += 1
          }
          val cb = new Array[Byte](cw * ch)
          val cr = new Array[Byte](cw * ch)
          var cy = 0
          while (cy < ch) {
            var cx = 0
            while (cx < cw) {
              cb(cy * cw + cx) = (64 + cx + 2 * cy + 3 * f).toByte
              cr(cy * cw + cx) = (160 - cx - cy - 2 * f).toByte
              cx += 1
            }
            cy += 1
          }
          (y, cb, cr)
        }
        Row(id, Y4mCodec.write(w, h, frames))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL-pixel frame embedding: per decoded frame, an 8-component
    * feature vector of luma BAND SUMS — 4 horizontal bands (h/4 rows
    * each) + 4 vertical bands (w/4 columns each) over the ACTUAL
    * decoded Y plane. This retires the mm_embed text-hash stand-in
    * for video: the vector is a pure function of real pixel content
    * (closed-form under the synth contract, so the oracle predicts
    * every component), integers exact in float32 (≤ ~20·5·255 ≪ 2²⁴),
    * and it feeds the SAME LSH bucket path real embeddings ride —
    * swap these band sums for an encoder's output column and nothing
    * downstream changes. Requires w, h divisible by 4 (the synth
    * contract guarantees it); other streams emit no rows for safety.
    */
  def y4mFrameEmbedding(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(
      StructField("doc_id", LongType) +: StructField("frame_idx", LongType) +:
        (0 until 8).map(j => StructField(s"e$j", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { r =>
        val id = r.getLong(idIdx)
        Y4mCodec.parse(r.getAs[Array[Byte]](pIdx)) match {
          case Some(v) if v.width % 4 == 0 && v.height % 4 == 0 =>
            val w = v.width
            val h = v.height
            val hb = h / 4
            val wb = w / 4
            v.frames.zipWithIndex.map { case (fr, fi) =>
              val e = new Array[Long](8)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val s = (fr.y(y * w + x) & 0xff).toLong
                  e(y / hb) += s
                  e(4 + x / wb) += s
                  x += 1
                }
                y += 1
              }
              Row.fromSeq(id +: fi.toLong +: e.toSeq)
            }
          case _ => Nil
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL video-frame decode + shot detection: parse the Y4M container,
    * walk the ACTUAL decoded planes, and emit per-doc frame statistics
    * plus content-based scene segmentation — a cut is declared when the
    * mean absolute luma difference against the previous frame exceeds
    * `sceneThreshold` (integer verdict: Σ|ΔY| > thr·w·h — no FP). This
    * is the real-pixel upgrade of mm_scenes' hash-equality stand-in:
    * swap the threshold rule for an embedding distance and nothing
    * downstream changes. Batched map-only codec scan, zero shuffle
    * before the final rollup; undecodable payloads yield null fields
    * (never a crash — Y4mCodec's hostile-bytes contract).
    */
  def y4mVideoStats(df: DataFrame, idCol: String, payloadCol: String,
      sceneThreshold: Long = 5L, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_frames", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("luma_sum", LongType), StructField("luma_min", LongType),
      StructField("luma_max", LongType), StructField("cb_sum", LongType),
      StructField("cr_sum", LongType), StructField("n_scenes", LongType),
      StructField("longest_scene", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        Y4mCodec.parse(r.getAs[Array[Byte]](pIdx)) match {
          case Some(v) if v.frames.nonEmpty =>
            var lumaSum = 0L
            var lumaMin = Long.MaxValue
            var lumaMax = Long.MinValue
            var cbSum = 0L
            var crSum = 0L
            var nScenes = 1L
            var run = 1L
            var longest = 1L
            val px = v.width.toLong * v.height
            var prev: Array[Byte] = null
            v.frames.foreach { fr =>
              var i = 0
              while (i < fr.y.length) {
                val s = fr.y(i) & 0xff
                lumaSum += s
                if (s < lumaMin) lumaMin = s
                if (s > lumaMax) lumaMax = s
                i += 1
              }
              i = 0
              while (i < fr.cb.length) { cbSum += fr.cb(i) & 0xff; i += 1 }
              i = 0
              while (i < fr.cr.length) { crSum += fr.cr(i) & 0xff; i += 1 }
              if (prev != null) {
                var d = 0L
                var j = 0
                while (j < fr.y.length) {
                  d += math.abs((fr.y(j) & 0xff) - (prev(j) & 0xff))
                  j += 1
                }
                if (d > sceneThreshold * px) { // content-based cut
                  nScenes += 1
                  if (run > longest) longest = run
                  run = 1L
                } else run += 1L
              }
              prev = fr.y
            }
            if (run > longest) longest = run
            Row(id, v.frames.length.toLong, v.width.toLong, v.height.toLong,
              lumaSum, lumaMin, lumaMax, cbSum, crSum, nScenes, longest)
          case _ => Row(id, null, null, null, null, null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic synthesized MJPEG-in-AVI containers (r16, the last
    * codec-family gap): per doc, 1 + id%4 grayscale JPEG frames in a
    * real RIFF/AVI wrapper ([[AviCodec.write]]). Frame content reuses
    * the [[synthJpegs]] constant-8×8-tile law with a per-PAIR frame
    * term — tile (bx, by) of frame f is
    * (id·7 + bx·31 + by·23 + (f/2)·41) mod 256 — so JPEG round-trips
    * bit-exactly (DC-only blocks), consecutive EVEN/ODD frames are
    * identical (no scene cut) and every pair boundary jumps all tiles
    * by ±41/215 (a guaranteed cut): the oracle predicts frames, sums
    * AND the scene structure in closed form.
    */
  def synthAvis(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    fanOut(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val nf = 1 + (id % 4L).toInt
        val bw = 1 + (id % 3L).toInt
        val bh = 1 + ((id * 5L + 3L) % 3L).toInt
        val w = 8 * bw
        val h = 8 * bh
        val frames = (0 until nf).map { f =>
          val pix = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              pix(y * w + x) =
                ((id * 7L + (x / 8) * 31L + (y / 8) * 23L + (f / 2) * 41L) % 256L).toInt
              x += 1
            }
            y += 1
          }
          JpegCodec.encodeGray(w, h, pix)
        }
        Row(id, AviCodec.write(w, h, frames))
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL container + image decode composition: walk the AVI's RIFF
    * chunks ([[AviCodec.parse]]), Huffman-decode every MJPEG frame
    * ([[JpegCodec.decodeGrayPixels]]), and roll up per-doc luma stats
    * plus CONTENT-based shot detection (integer verdict
    * Σ|ΔY| > thr·w·h against the previous decoded frame — the
    * y4mVideoStats rule over DCT-decoded pixels). A frame that fails
    * JPEG decode, dims disagreeing with the container header, or an
    * unparseable container all yield null fields — never a crash.
    * Batched map-only codec scan, zero shuffle before the rollup.
    */
  def aviVideoStats(df: DataFrame, idCol: String, payloadCol: String,
      sceneThreshold: Long = 5L, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_frames", LongType),
      StructField("width", LongType), StructField("height", LongType),
      StructField("sum_gray", LongType), StructField("min_gray", LongType),
      StructField("max_gray", LongType), StructField("n_scenes", LongType),
      StructField("longest_scene", LongType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val id = r.getLong(idIdx)
        val parsed = Option(r.getAs[Array[Byte]](pIdx)).flatMap(AviCodec.parse)
        val decoded = parsed.map { v =>
          (v, v.frames.map(JpegCodec.decodeGrayPixels))
        }
        decoded match {
          case Some((v, frames)) if frames.forall(f =>
              f.exists(d => d._1 == v.width && d._2 == v.height)) =>
            val px = v.width.toLong * v.height
            var sum = 0L
            var mn = 255L
            var mx = 0L
            var nScenes = 1L
            var longest = 0L
            var run = 0L
            var prev: Array[Int] = null
            frames.foreach { fo =>
              val pix = fo.get._3
              var i = 0
              while (i < pix.length) {
                val p = pix(i)
                sum += p
                if (p < mn) mn = p
                if (p > mx) mx = p
                i += 1
              }
              if (prev != null) {
                var d = 0L
                var j = 0
                while (j < pix.length) { d += math.abs(pix(j) - prev(j)); j += 1 }
                if (d > sceneThreshold * px) {
                  nScenes += 1
                  if (run > longest) longest = run
                  run = 1L
                } else run += 1L
              } else run = 1L
              prev = pix
            }
            if (run > longest) longest = run
            Row(id, v.frames.length.toLong, v.width.toLong, v.height.toLong,
              sum, mn, mx, nScenes, longest)
          case _ => Row(id, null, null, null, null, null, null, null, null)
        }
      })
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
