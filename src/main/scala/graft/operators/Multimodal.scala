package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (driver north-star
  * scope): image/audio/video as opaque `binary` columns with typed
  * metadata, and decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, per-partition batch shape,
  * partition sizing — and so are the IMAGE, WAV-AUDIO and MJPEG-AVI
  * codecs: content with raster magic bytes (PNG/BMP/GIF/JPEG) decodes
  * real pixels through the JDK-builtin `javax.imageio` (decode + resize
  * re-encode), RIFF/WAVE PCM parses its real samples with plain byte
  * arithmetic, and MJPEG-in-AVI splits into real per-frame JPEGs by the
  * same RIFF chunk walk. Inter-frame-compressed audio/video (mp3, h264…)
  * would need codec libraries this container lacks, so those paths (and
  * non-media bytes like the documents fixture) use a deterministic
  * md5-derived STUB; swapping in e.g. javacpp-ffmpeg only replaces the
  * marked fallback functions.
  *
  * Scale design:
  *  - media rows are large → `repartition` before decode so each task
  *    holds a bounded byte budget, not a bounded row count;
  *  - decode runs in `mapPartitions`, one codec context per PARTITION
  *    (never per row) — the Scala analogue of a batched Pandas UDF;
  *  - features go to fixed-width Array[Float] columns, the shape the
  *    similarity operators ([[Similarity]]) consume directly.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long, codec: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, meanLuma: Double)
  case class MediaFeature(media_id: Long, feature: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

  /** ======== REAL CODEC LAYER (images) ========
    * Content whose magic bytes identify a real raster format decodes
    * through `javax.imageio` (JDK-builtin: PNG, BMP, GIF, JPEG — no new
    * dependencies). Anything else falls through to the md5 stub below, so
    * the oracle-recomputable gate queries (which feed utf-8 text bytes)
    * keep hash-verifying while genuinely-encoded images get real pixels.
    */
  private[graft] def imageFormat(content: Array[Byte]): Option[String] = {
    def startsWith(magic: Int*): Boolean =
      content.length >= magic.length &&
        magic.zipWithIndex.forall { case (m, i) => (content(i) & 0xff) == m }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) Some("png")
    else if (startsWith(0x42, 0x4d)) Some("bmp")
    else if (startsWith(0x47, 0x49, 0x46, 0x38)) Some("gif")
    else if (startsWith(0xff, 0xd8, 0xff)) Some("jpeg")
    else None
  }

  private def readImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // NonFatal, not just IOException: plugin readers throw unchecked
    // exceptions (IndexOutOfBounds/IllegalArgument/NegativeArraySize) on
    // garbage whose magic bytes happen to match (e.g. text starting with
    // "BM") — the contract is None → md5-stub fallback, never a crashed
    // task
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real decode: dimensions from the raster, channels from the color
    * model, meanLuma = mean over pixels of Rec.601 luma
    * (0.299 R + 0.587 G + 0.114 B) / 255 ∈ [0, 1].
    */
  private def decodeImage(img: java.awt.image.BufferedImage): DecodedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    DecodedImage(0L, w, h, img.getColorModel.getNumComponents,
      sum / (w.toLong * h) / 255.0)
  }

  /** Bilinear rescale to a w×h RGB raster — shared by [[resize]] (which
    * re-encodes it) and the real feature extractor (which reads its luma
    * grid).
    */
  private def scaleTo(img: java.awt.image.BufferedImage, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  /** Real image feature: rescale to the smallest square grid covering
    * `dim` cells, then emit each cell's Rec.601 luma mapped to [−1, 1) in
    * row-major order — a deterministic perceptual downsample, the classic
    * pre-embedding baseline.
    */
  private def realFeature(img: java.awt.image.BufferedImage, dim: Int)
      : Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val grid = scaleTo(img, g, g)
    Array.tabulate(dim) { i =>
      val rgb = grid.getRGB(i % g, i / g)
      val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      (luma / 127.5 - 1.0).toFloat
    }
  }

  /** ======== REAL CODEC LAYER (audio: RIFF/WAVE PCM) ========
    * Canonical uncompressed WAV needs no codec library — the RIFF
    * container and 8/16-bit PCM payload parse with plain byte arithmetic,
    * so audio gets the same real-decode treatment as images. Compressed
    * audio (mp3/flac/ogg) still needs libraries this container lacks and
    * falls through to the md5 stub.
    */
  case class WavPcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
      /** interleaved samples normalized to [-1, 1]. */
      samples: Array[Float]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames * 1000L / sampleRate
  }

  private[graft] def isWav(content: Array[Byte]): Boolean =
    content.length >= 12 &&
      new String(content, 0, 4, "US-ASCII") == "RIFF" &&
      new String(content, 8, 4, "US-ASCII") == "WAVE"

  /** Chunk-walking RIFF parser: finds `fmt ` and `data`, accepts PCM
    * (format 1) at 8 or 16 bits. Returns None on anything malformed —
    * callers fall back to the stub, never throw on hostile bytes.
    */
  private[graft] def parseWav(content: Array[Byte]): Option[WavPcm] = {
    if (!isWav(content)) return None
    val buf = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, length)
      while (pos + 8 <= content.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(content, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // compare in Long: a hostile length near Int.MaxValue overflows
        // `pos + 8 + len` and would slip past an Int-typed bounds check
        // straight into a multi-GB allocation
        if (len < 0 || pos + 8L + len > content.length) return None
        if (id == "fmt " && len >= 16)
          fmt = Some((buf.getShort(pos + 8) & 0xffff,
            buf.getShort(pos + 10) & 0xffff, buf.getInt(pos + 12),
            buf.getShort(pos + 22) & 0xffff))
        else if (id == "data") data = Some((pos + 8, len))
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      for {
        (format, ch, rate, bits) <- fmt
        if format == 1 && ch > 0 && rate > 0 && (bits == 8 || bits == 16)
        (off, len) <- data
      } yield {
        val samples =
          if (bits == 16) Array.tabulate(len / 2)(i =>
            buf.getShort(off + 2 * i) / 32768.0f)
          else Array.tabulate(len)(i =>
            ((content(off + i) & 0xff) - 128) / 128.0f)
        WavPcm(ch, rate, bits, samples)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 16-bit mono PCM WAV bytes of a pure sine at 0.6 full-scale — the
    * synthesis half of the tone-detection gate: the bytes are a REAL
    * RIFF container, round-tripped through [[parseWav]] like any
    * ingested audio (never handed to the analyzer as raw samples).
    */
  private[graft] def sineWav(freq: Double, nSamples: Int,
      rate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((19660.8 *
        math.sin(2.0 * math.Pi * freq * i / rate)).toShort)
      i += 1
    }
    bb.array()
  }

  /** 16-bit mono PCM WAV bytes of an integer sawtooth
    * (`s_i = (i·step) mod 65536 − 32768`) — the ANALYTIC-synthesis
    * counterpart of [[sineWav]]: every sample is a closed-form integer
    * of (i, step), so downstream integer DSP (the resampler) can be
    * oracled per-sample in SQL, not just per-decision like the tone
    * detector.
    */
  private[graft] def sawWav(step: Long, nSamples: Int,
      rate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort(((i * step) % 65536L - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  // ---- IMA ADPCM (WAV format tag 0x11) — a REAL compressed-audio
  // codec in pure JVM (the mp3/h264 gap is env-bound: the JDK ships no
  // codec and egress is zero; IMA ADPCM is table-driven integer DSP,
  // so the decoder is exact and the whole decode recurrence replays in
  // SQL). Tables are the published IMA/DVI spec constants.
  private val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Mono IMA-ADPCM WAV container over the given 4-bit codes — one
    * block: the 4-byte header carries the SEED sample (0) and start
    * index (0), then packed nibbles (low nibble first, the IMA layout).
    * A real RIFF container with format tag 0x11 + the samplesPerBlock
    * extension; parse back only through [[parseImaAdpcm]].
    */
  private[graft] def imaAdpcmWav(nibbles: Array[Int],
      rate: Int): Array[Byte] = {
    val nBytes = (nibbles.length + 1) / 2
    val blockAlign = 4 + nBytes
    val samplesPerBlock = nibbles.length + 1
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 8 + blockAlign)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(20).putShort(0x11).putShort(1).putInt(rate)
      .putInt(rate * blockAlign / samplesPerBlock)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)
      .put("data".getBytes("US-ASCII")).putInt(blockAlign)
      .putShort(0).put(0: Byte).put(0: Byte) // seed sample 0, index 0
    var k = 0
    while (k < nBytes) {
      val lo = nibbles(2 * k) & 0xf
      val hi = if (2 * k + 1 < nibbles.length) nibbles(2 * k + 1) & 0xf else 0
      bb.put(((hi << 4) | lo).toByte)
      k += 1
    }
    bb.array()
  }

  /** Chunk-walking parser + block decoder for mono IMA-ADPCM WAVs
    * (format tag 0x11, 4-bit): per block, the header sample seeds the
    * predictor, then each nibble advances the published step/index
    * tables — `diff = step>>3 (+step if b2) (+step>>1 if b1)
    * (+step>>2 if b0)`, sign bit b3, predictor clamped to Int16, index
    * clamped to [0, 88]. samplesPerBlock bounds the valid nibbles (a
    * pad nibble in the last byte never decodes). Returns 16-bit
    * [[WavPcm]] (power-of-two normalization — `round(s·32768)` recovers
    * the exact integer samples). None on anything malformed.
    */
  private[graft] def parseImaAdpcm(content: Array[Byte]): Option[WavPcm] = {
    if (!isWav(content)) return None
    val buf = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (pos + 8 <= content.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(content, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos + 8L + len > content.length) return None
        if (id == "fmt " && len >= 20)
          fmt = Some((buf.getShort(pos + 8) & 0xffff,
            buf.getShort(pos + 10) & 0xffff, buf.getInt(pos + 12),
            buf.getShort(pos + 20) & 0xffff, // blockAlign
            buf.getShort(pos + 26) & 0xffff)) // samplesPerBlock (ext)
        else if (id == "data") data = Some((pos + 8, len))
        pos += 8 + len + (len & 1)
      }
      for {
        (format, ch, rate, blockAlign, spb) <- fmt
        if format == 0x11 && ch == 1 && rate > 0 && blockAlign > 4 &&
          spb >= 1
        (off, len) <- data
      } yield {
        val out = Array.newBuilder[Float]
        var blk = off
        while (blk + blockAlign <= off + len) {
          var pred: Int = buf.getShort(blk).toInt
          var idx: Int =
            math.max(0, math.min(88, content(blk + 2) & 0xff))
          out += pred / 32768.0f
          var produced = 1
          var b = blk + 4
          while (b < blk + blockAlign && produced < spb) {
            val byte = content(b) & 0xff
            var half = 0
            while (half < 2 && produced < spb) {
              val n = if (half == 0) byte & 0xf else byte >> 4
              val step = AdpcmStepTable(idx)
              var diff = step >> 3
              if ((n & 4) != 0) diff += step
              if ((n & 2) != 0) diff += step >> 1
              if ((n & 1) != 0) diff += step >> 2
              pred = if ((n & 8) != 0) pred - diff else pred + diff
              pred = math.max(-32768, math.min(32767, pred))
              idx = math.max(0, math.min(88, idx + AdpcmIndexTable(n)))
              out += pred / 32768.0f
              produced += 1
              half += 1
            }
            b += 1
          }
          blk += blockAlign
        }
        WavPcm(1, rate, 16, out.result())
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode IMA-ADPCM WAVs and report exact integer sample statistics
    * per media row — (media_id, n_samples, sum_s, min_s, max_s) in
    * Int16 units (`round(s·32768)` exact recovery). The codec-coverage
    * audit lane: the numbers only match an analytic oracle if the RIFF
    * parse, block walk, and table-driven decode recurrence are all
    * exact. Undecodable bytes emit no row; mapPartitions
    * codec-per-partition like the other decoders.
    */
  def adpcmStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseImaAdpcm(bytes).map { w =>
          val s = w.samples.map(v => math.round(v * 32768f).toLong)
          (id, s.length.toLong, s.sum, s.min, s.max)
        }
      }).toDF("media_id", "n_samples", "sum_s", "min_s", "max_s")
  }

  // ---- G.711 (WAV format tags 7 = μ-law, 6 = A-law) — the telephony
  // companding codecs, pure closed-form integer expansion (the
  // CCITT/Sun g711.c reference formulas), so every decoded sample is a
  // one-expression function of its code byte and the oracle needs no
  // recursion at all.
  private[graft] def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0xf) << 3) + 132
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 132 - t else t - 132
  }

  private[graft] def alawToLinear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0xf) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** μ-law encoder (the g711.c search over segment ends) — the encode
    * half used by the round-trip spec; codewords are fixed points:
    * `linear2ulaw(ulaw2linear(u)) == u` for every byte. */
  private[graft] def linearToUlaw(pcm0: Int): Int = {
    val (pcm1, mask) =
      if (pcm0 < 0) (132 - pcm0, 0x7f) else (pcm0 + 132, 0xff)
    val pcm = math.min(pcm1, 0x7fff)
    var seg = 0
    while (seg < 8 && pcm > ((0xff << seg) | ((1 << seg) - 1))) seg += 1
    val uval =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((pcm >> (seg + 3)) & 0xf)
    uval ^ mask
  }

  /** A-law encoder (the g711.c search with the 0x55 even-bit toggle) —
    * completes the encoder pair; codewords are fixed points:
    * `linear2alaw(alaw2linear(a)) == a` for every byte (A-law's
    * mid-rise quantizer has no ±0 collapse). */
  private[graft] def linearToAlaw(pcm0: Int): Int = {
    val (pcm1, mask) =
      if (pcm0 >= 0) (pcm0, 0xd5) else (-pcm0 - 8, 0x55)
    val pcm = math.min(pcm1, 0x7fff)
    var seg = 0
    while (seg < 8 && pcm > ((0xff << seg) | ((1 << seg) - 1))) seg += 1
    val aval =
      if (seg >= 8) 0x7f
      else (seg << 4) |
        (if (seg < 2) (pcm >> 4) & 0xf else (pcm >> (seg + 3)) & 0xf)
    aval ^ mask
  }

  /** Mono G.711 WAV container: format tag 7 (μ-law) or 6 (A-law),
    * 8 bits per sample, data = raw code bytes. */
  private[graft] def g711Wav(codes: Array[Int], rate: Int,
      aLaw: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 26 + 8 + codes.length)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(18).putShort(if (aLaw) 6 else 7).putShort(1).putInt(rate)
      .putInt(rate).putShort(1).putShort(8).putShort(0)
      .put("data".getBytes("US-ASCII")).putInt(codes.length)
    codes.foreach(c => bb.put((c & 0xff).toByte))
    bb.array()
  }

  /** Chunk-walking parser + expander for G.711 WAVs: accepts format
    * tags 7 (μ-law) and 6 (A-law) at 8 bits, expands every code byte
    * through the closed-form CCITT tables to 16-bit linear. None on
    * anything malformed. */
  private[graft] def parseG711(content: Array[Byte]): Option[WavPcm] = {
    if (!isWav(content)) return None
    val buf = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (pos + 8 <= content.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(content, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos + 8L + len > content.length) return None
        if (id == "fmt " && len >= 16)
          fmt = Some((buf.getShort(pos + 8) & 0xffff,
            buf.getShort(pos + 10) & 0xffff, buf.getInt(pos + 12),
            buf.getShort(pos + 22) & 0xffff))
        else if (id == "data") data = Some((pos + 8, len))
        pos += 8 + len + (len & 1)
      }
      for {
        (format, ch, rate, bits) <- fmt
        if (format == 6 || format == 7) && ch == 1 && rate > 0 && bits == 8
        (off, len) <- data
      } yield {
        val dec: Int => Int =
          if (format == 7) ulawToLinear else alawToLinear
        WavPcm(1, rate, 16, Array.tabulate(len)(i =>
          dec(content(off + i) & 0xff) / 32768.0f))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode G.711 WAVs (μ-law or A-law by format tag) and report exact
    * integer sample statistics — the [[adpcmStats]] shape for the
    * telephony codecs. Undecodable bytes emit no row. */
  def g711Stats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseG711(bytes).map { w =>
          val s = w.samples.map(v => math.round(v * 32768f).toLong)
          (id, s.length.toLong, s.sum, s.min, s.max)
        }
      }).toDF("media_id", "n_samples", "sum_s", "min_s", "max_s")
  }

  /** μ-law round-trip quantization audit: encode every Int16 PCM sample
    * with [[linearToUlaw]], expand it back with [[ulawToLinear]], and
    * report the exact integer error profile — (media_id, n_samples,
    * sum_err, max_abs_err, sse) — the codec-quality regression signal
    * (companding error is deterministic, so any drift in either half of
    * the codec moves these integers). Input is plain 16-bit mono PCM
    * WAVs; undecodable bytes emit no row.
    */
  def g711RoundTripStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWav(bytes).collect {
          case WavPcm(ch, _, 16, samples) if ch == 1 =>
            var sum = 0L
            var maxAbs = 0L
            var sse = 0L
            samples.foreach { v =>
              val s = math.round(v * 32768f).toInt
              val e = (ulawToLinear(linearToUlaw(s)) - s).toLong
              sum += e
              if (math.abs(e) > maxAbs) maxAbs = math.abs(e)
              sse += e * e
            }
            (id, samples.length.toLong, sum, maxAbs, sse)
        }
      }).toDF("media_id", "n_samples", "sum_err", "max_abs_err", "sse")
  }

  /** Rational-ratio linear PCM resampler statistics, EXACT on Int16
    * units: output index j maps to input position `j·m/l` (resample by
    * factor l/m — e.g. l=3, m=8 takes 8 kHz to 3 kHz), and the
    * interpolated amplitude is computed in OFFSET-BINARY integer units
    * (`u = round(s·32768) + 32768 ∈ [0, 65535]`, the exact-recovery
    * lane [[parseWav]]'s power-of-two normalization guarantees) with
    * floor division only: `amp = (u_k·(l−r) + u_{k+1}·r) div l`,
    * k = (j·m) div l, r = (j·m) mod l — non-negative throughout, so
    * Spark `div` ≡ DuckDB `//` and the whole chain (container parse →
    * sample recovery → interpolation → aggregation) reproduces
    * bit-for-bit in SQL. Emits one row per media: (media_id, n_out,
    * sum_amp, min_amp, max_amp). Codec work runs per partition
    * ([[mapInPandas]]-shaped batch loop, no per-row JVM↔anything hops);
    * media never shuffles — one scan, one row out per asset.
    */
  def resamplePcmStats(media: DataFrame, l: Int, m: Int,
      idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    require(l > 0 && m > 0, "resample ratio must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWav(bytes).collect {
          case WavPcm(ch, _, 16, samples) if ch == 1 && samples.length >= 2 =>
            val u = samples.map(s => math.round(s * 32768f).toLong + 32768L)
            val n = u.length
            val nOut = ((n - 1).toLong * l) / m + 1
            var j = 0L
            var sum = 0L
            var min = Long.MaxValue
            var max = Long.MinValue
            while (j < nOut) {
              val t = j * m
              val k = (t / l).toInt
              val r = t % l
              val amp =
                if (r == 0L) u(k)
                else (u(k) * (l - r) + u(k + 1) * r) / l
              sum += amp
              if (amp < min) min = amp
              if (amp > max) max = amp
              j += 1
            }
            (id, nOut, sum, min, max)
        }
      })
      .toDF(idCol, "n_out", "sum_amp", "min_amp", "max_amp")
  }

  /** Hop-framed PCM energies — the STFT SKELETON every audio pipeline
    * runs before any transform (framing + hop arithmetic + per-frame
    * reduction), kept EXACT: frame f covers samples
    * [f·hop, f·hop + frameLen) (full frames only), and its energy is
    * the pure-integer Σu² over OFFSET-BINARY units
    * (`u = round(s·32768) + 32768` — the parseWav power-of-two exact
    * recovery, so the statistic is analytically oracle-able per frame).
    * Output: (media_id, frame_idx, n, energy) long-form, one row per
    * full frame; undecodable or non-16-bit-mono bytes emit no rows.
    */
  def frameEnergyStats(media: DataFrame, frameLen: Int, hop: Int,
      idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    require(frameLen > 0 && hop > 0, "frame and hop must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWav(bytes).toSeq.collect {
          case WavPcm(ch, _, 16, samples) if ch == 1 =>
            val u = samples.map(s => math.round(s * 32768f).toLong + 32768L)
            val nFrames =
              if (u.length < frameLen) 0
              else (u.length - frameLen) / hop + 1
            (0 until nFrames).map { f =>
              var e = 0L
              var i = f * hop
              while (i < f * hop + frameLen) { e += u(i) * u(i); i += 1 }
              (id, f.toLong, frameLen.toLong, e)
            }
        }.flatten
      })
      .toDF(idCol, "frame_idx", "n", "energy")
  }

  /** Goertzel single-bin power at (the nearest DFT bin to) `freq` —
    * the classic O(n)-per-tone detector; no FFT dependency. Returns
    * power normalized by n² so it is amplitude-scaled, length-free.
    */
  private[graft] def goertzelPower(mono: Array[Double], rate: Int,
      freq: Double): Double = {
    val n = mono.length
    if (n == 0 || rate <= 0) return 0.0
    val k = math.round(freq * n / rate).toDouble
    val w = 2.0 * math.Pi * k / n
    val coeff = 2.0 * math.cos(w)
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      val s0 = mono(i) + coeff * s1 - s2
      s2 = s1; s1 = s0; i += 1
    }
    (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n)
  }

  /** Dominant tone per track: parse the RIFF bytes, mix to mono, score
    * every candidate frequency with Goertzel, argmax (ties → lowest
    * frequency). Non-WAV bytes emit dom_freq = −1. Pure mapPartitions
    * projection — the codec-per-partition shape of the other decoders;
    * candidate list rides along as a closure constant (metadata scale).
    */
  def dominantTone(media: DataFrame, freqs: Seq[Double]): DataFrame = {
    require(freqs.nonEmpty, "need at least one candidate frequency")
    val ss = media.sparkSession
    import ss.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseWav(bytes) match {
            case Some(w) if w.nFrames > 0 =>
              val n = w.nFrames
              val mono = Array.tabulate(n) { f =>
                var s = 0.0
                var c = 0
                while (c < w.channels) {
                  s += w.samples(f * w.channels + c); c += 1
                }
                s / w.channels
              }
              val powers =
                freqs.map(fr => goertzelPower(mono, w.sampleRate, fr))
              val best = powers.zipWithIndex
                .maxBy { case (p, i) => (p, -i) }._2
              (id, freqs(best), powers(best))
            case _ => (id, -1.0, 0.0)
          }
        }
      }.toDF("media_id", "dom_freq", "power")
  }

  /** Lossless grayscale-as-RGB PNG of a computed pixel field — the
    * synthesis half of the patch-grid gate. TYPE_INT_RGB (not
    * TYPE_BYTE_GRAY, whose gray→sRGB color-space conversion shifts
    * values) + PNG's losslessness means decode returns the exact bytes
    * `f` produced, so patch statistics are analytically predictable.
    */
  private[graft] def grayscalePng(wh: Int,
      f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(wh, wh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < wh) {
      var x = 0
      while (x < wh) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ViT-style patch grid: decode the image, cut it into grid×grid
    * equal patches, and emit each patch's INTEGER mean luma in permille
    * (Σ(299R + 587G + 114B) over the patch, div pixel count — the
    * imagePhash integer-luma lane, so grayscale pixels contribute
    * exactly 1000·v and the statistic is analytically oracle-able).
    * The patch tensor every vision pipeline feeds its encoder, as a
    * long-form (media_id, px, py, luma_pm) relation. Images whose
    * dimensions don't divide the grid, and undecodable bytes, emit no
    * rows. mapPartitions codec-per-partition like the other decoders.
    */
  def patchLumaGrid(media: Dataset[MediaRow], grid: Int): DataFrame = {
    require(grid > 0, "grid must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      imageFormat(r.content).flatMap(_ => readImage(r.content)) match {
        case Some(img)
            if img.getWidth % grid == 0 && img.getHeight % grid == 0 =>
          val (pw, ph) = (img.getWidth / grid, img.getHeight / grid)
          for {
            py <- 0 until grid
            px <- 0 until grid
          } yield {
            var sum = 0L
            var y = py * ph
            while (y < (py + 1) * ph) {
              var x = px * pw
              while (x < (px + 1) * pw) {
                val rgb = img.getRGB(x, y)
                sum += 299L * ((rgb >> 16) & 0xff) +
                  587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            (r.media_id, px, py, sum / (pw.toLong * ph))
          }
        case _ => Seq.empty
      }
    }.toDF("media_id", "px", "py", "luma_pm")
  }

  /** Full-reference image-quality stats over decoded pairs — the
    * codec/transform regression audit of a vision pipeline (did a
    * re-encode, resize or augmentation change pixels, and by how much):
    * per (media_id, a, b) pair, INTEGER SSE and max absolute error over
    * the 8-bit gray channel (the red channel of the TYPE_INT_RGB
    * lossless lane — all channels equal by construction on grayscale
    * media), plus PSNR as `floor(10·log10(255²·n / sse))` dB — floor of
    * a double both engines compute identically from the same exact
    * integers (the CLAUDE floor-on-raw-double discipline, never
    * round(p)). Identical pixels report sse = 0 and NULL psnr;
    * dimension-mismatched or undecodable pairs emit no row. Same
    * mapPartitions codec-per-partition shape as the other decoders.
    */
  def imagePairStats(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    pairs.select(col("media_id").cast("long"), col("a"), col("b"))
      .as[(Long, Array[Byte], Array[Byte])]
      .flatMap { case (id, a, b) =>
        (readImage(a), readImage(b)) match {
          case (Some(ia), Some(ib))
              if ia.getWidth == ib.getWidth && ia.getHeight == ib.getHeight =>
            var sse = 0L
            var maxAbs = 0L
            var y = 0
            while (y < ia.getHeight) {
              var x = 0
              while (x < ia.getWidth) {
                val va = (ia.getRGB(x, y) >> 16) & 0xff
                val vb = (ib.getRGB(x, y) >> 16) & 0xff
                val d = (va - vb).toLong
                sse += d * d
                if (math.abs(d) > maxAbs) maxAbs = math.abs(d)
                x += 1
              }
              y += 1
            }
            Some((id, ia.getWidth.toLong * ia.getHeight, sse, maxAbs))
          case _ => None
        }
      }.toDF("media_id", "n_px", "sse", "max_abs_err")
      .withColumn("psnr_db_floor",
        when(col("sse") > 0,
          floor(lit(10.0) * log10(lit(65025.0) * col("n_px") / col("sse")))))
  }

  /** Global histogram equalization statistics — the contrast-normalize
    * step of a vision-preprocessing pipeline, kept EXACT: per image,
    * the gray channel's integer CDF remaps each pixel as
    * `new_v = (cdf(v) − cdf_min) · 255 div (n − cdf_min)` (cdf_min =
    * the darkest present value's count — the classic OpenCV formula,
    * floor division on non-negative integers so both engines agree
    * bit-for-bit; a constant image maps to 0). Output per image:
    * (media_id, n_px, sum_eq, min_eq, max_eq) over the remapped
    * pixels. Undecodable bytes emit no row.
    */
  def equalizeStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        readImage(bytes).map { img =>
          val n = img.getWidth.toLong * img.getHeight
          val hist = new Array[Long](256)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              hist((img.getRGB(x, y) >> 16) & 0xff) += 1
              x += 1
            }
            y += 1
          }
          val cdf = new Array[Long](256)
          var acc = 0L
          var v = 0
          while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
          val cdfMin = hist.indexWhere(_ > 0) match {
            case -1 => 0L
            case i => hist(i)
          }
          var sum = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val pv = (img.getRGB(x, y) >> 16) & 0xff
              val nv =
                if (n == cdfMin) 0L
                else (cdf(pv) - cdfMin) * 255L / (n - cdfMin)
              sum += nv
              if (nv < mn) mn = nv
              if (nv > mx) mx = nv
              x += 1
            }
            y += 1
          }
          (id, n, sum, mn, mx)
        }
      }).toDF("media_id", "n_px", "sum_eq", "min_eq", "max_eq")
  }

  /** Nearest-neighbor image resize — the standardize-resolution step of
    * a vision-data pipeline, kept EXACT on purpose: output pixel (x, y)
    * copies input pixel (x·w_in div w_out, y·h_in div h_out) — pure
    * integer index arithmetic, no interpolation floats — and re-encodes
    * losslessly (TYPE_INT_RGB + PNG, the grayscalePng discipline), so
    * downstream decode ops ([[patchLumaGrid]], [[lumaHistogram]])
    * compose on the resized rows under analytic oracles. Bilinear lives
    * behind real codec stacks; NN is the deterministic cross-engine
    * lane. Undecodable bytes drop. Same mapPartitions codec shape.
    */
  def resizeNN(media: Dataset[MediaRow], outW: Int, outH: Int)
      : Dataset[MediaRow] = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      imageFormat(r.content).flatMap(_ => readImage(r.content)).map { img =>
        val out = new java.awt.image.BufferedImage(outW, outH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            out.setRGB(x, y, img.getRGB(
              (x.toLong * img.getWidth / outW).toInt,
              (y.toLong * img.getHeight / outH).toInt))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRow(r.media_id, bos.toByteArray,
          r.meta.copy(width = outW, height = outH, codec = "png"))
      }
    }
  }

  /** Deterministic geometric augmentation — the vision-training
    * expansion pass (identity + 90° clockwise rotation + horizontal
    * flip), kept EXACT: both transforms are pure index permutations
    * (rot90: out(x,y) = in(y, H−1−x); flipH: out(x,y) = in(W−1−x, y))
    * re-encoded losslessly, so downstream decode ops compose under
    * analytic oracles ([[resizeNN]]'s discipline — no interpolation,
    * no randomness: the "random" augmentation choice belongs to the
    * trainer's sampler, not the data layer). Variant ids pack as
    * `media_id·10 + {0 identity, 1 rot90, 2 flipH}` (documented
    * contract; callers recover the source id with div 10). Undecodable
    * bytes drop. Same mapPartitions codec shape.
    */
  def augmentGeom(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      imageFormat(r.content).flatMap(_ => readImage(r.content)) match {
        case Some(img) =>
          val w = img.getWidth
          val h = img.getHeight
          def mk(ow: Int, oh: Int, f: (Int, Int) => Int): Array[Byte] = {
            val o = new java.awt.image.BufferedImage(ow, oh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) { o.setRGB(x, y, f(x, y)); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(o, "png", bos)
            bos.toByteArray
          }
          val rot = mk(h, w, (x, y) => img.getRGB(y, h - 1 - x))
          val flip = mk(w, h, (x, y) => img.getRGB(w - 1 - x, y))
          Seq(
            MediaRow(r.media_id * 10, r.content, r.meta),
            MediaRow(r.media_id * 10 + 1, rot,
              r.meta.copy(width = h, height = w, codec = "png")),
            MediaRow(r.media_id * 10 + 2, flip, r.meta.copy(codec = "png")))
        case None => Seq.empty
      }
    }
  }

  /** Integer luma histogram per image — the exposure/contrast profile
    * a vision-data curation pass filters on (all-dark / blown-out /
    * low-dynamic-range frames). Pixels bin on the permille-luma scale
    * (299R + 587G + 114B, the [[patchLumaGrid]] lane): bin =
    * luma_pm · bins div 256000 — pure integer, so for grayscale pixels
    * (luma_pm = 1000·v) the bin is exactly v div (256/bins) and the
    * statistic is analytically oracle-able. `bins` must divide 256 to
    * keep that identity. Output long-form (media_id, bin, n_px); empty
    * bins carry no rows; undecodable bytes emit none. Same
    * codec-per-partition mapPartitions shape as the other decoders —
    * the histogram is computed inside the scan, so only (id, bin,
    * count) rows ever shuffle.
    */
  def lumaHistogram(media: Dataset[MediaRow], bins: Int): DataFrame = {
    require(bins > 0 && 256 % bins == 0, "bins must divide 256")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      imageFormat(r.content).flatMap(_ => readImage(r.content)) match {
        case Some(img) =>
          val counts = new Array[Long](bins)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lumaPm = 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              val b = (lumaPm * bins / 256000L).toInt
              counts(math.min(b, bins - 1)) += 1L
              x += 1
            }
            y += 1
          }
          (0 until bins).filter(counts(_) > 0L)
            .map(b => (r.media_id, b, counts(b)))
        case None => Seq.empty
      }
    }.toDF("media_id", "bin", "n_px")
  }

  /** Voice-activity segmentation by windowed PCM energy (the silence-
    * trimming primitive of speech-data curation): cut the mono track
    * into fixed windows of `windowSamples`, mark a window VOICED when
    * its integer mean-square energy exceeds `meanSqThreshold`
    * (Σ s² > threshold · window — pure Int16→Long arithmetic, no
    * floats, so the decision is exact on any engine), and report the
    * maximal voiced runs: run count, voiced-window total, and the first
    * voiced window index (−1 when fully silent). Multi-channel tracks
    * sum channels per frame BEFORE squaring (still integer). parseWav
    * normalizes by a POWER OF TWO (s/32768), so `round(s·32768)`
    * recovers the original Int16 units exactly — the energy lane never
    * leaves integer arithmetic. Same mapPartitions codec-per-partition
    * shape as [[dominantTone]]; non-WAV bytes emit (−1, −1, −1).
    */
  def vadSegments(media: DataFrame, windowSamples: Int,
      meanSqThreshold: Long): DataFrame = {
    require(windowSamples > 0, "windowSamples must be positive")
    val ss = media.sparkSession
    import ss.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseWav(bytes) match {
            case Some(w) if w.nFrames >= windowSamples =>
              val nWin = w.nFrames / windowSamples
              var segs = 0L
              var voiced = 0L
              var first = -1L
              var prevVoiced = false
              var wi = 0
              while (wi < nWin) {
                var e = 0L
                var f = wi * windowSamples
                val end = f + windowSamples
                while (f < end) {
                  var s = 0L
                  var c = 0
                  while (c < w.channels) {
                    s += Math.round(w.samples(f * w.channels + c) * 32768f)
                      .toLong
                    c += 1
                  }
                  e += s * s; f += 1
                }
                val isVoiced = e > meanSqThreshold * windowSamples
                if (isVoiced) {
                  voiced += 1
                  if (first < 0) first = wi
                  if (!prevVoiced) segs += 1
                }
                prevVoiced = isVoiced
                wi += 1
              }
              (id, segs, voiced, first)
            case _ => (id, -1L, -1L, -1L)
          }
        }
      }.toDF("media_id", "n_segments", "n_voiced", "first_voiced")
  }

  /** 16-bit mono PCM WAV of a TONE SEQUENCE — one sine segment per
    * entry of `freqs`, `samplesPerSeg` samples each, phase reset at
    * segment boundaries. Same real RIFF container as [[sineWav]]; the
    * synthesis half of the audio-fingerprint gate. */
  private[graft] def toneSequenceWav(freqs: Seq[Double],
      samplesPerSeg: Int, rate: Int): Array[Byte] = {
    val nSamples = freqs.length * samplesPerSeg
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    freqs.foreach { freq =>
      var i = 0
      while (i < samplesPerSeg) {
        bb.putShort((19660.8 *
          math.sin(2.0 * math.Pi * freq * i / rate)).toShort)
        i += 1
      }
    }
    bb.array()
  }

  /** Acoustic fingerprint per track: parse the RIFF bytes, mix to mono,
    * cut into `nSegs` equal frames, detect each frame's dominant tone
    * among `freqs` by Goertzel argmax (ties → lowest index), and pack
    * the per-frame symbol sequence into ONE BIGINT fingerprint
    * `Σ sym_k · |freqs|^k` (frame 0 = least-significant digit). The
    * frame-wise twin of [[dominantTone]] — same mapPartitions
    * codec-per-partition shape, candidates as a closure constant.
    * Non-WAV / too-short tracks emit fingerprint = −1. */
  def toneFingerprint(media: DataFrame, freqs: Seq[Double],
      nSegs: Int): DataFrame = {
    require(freqs.nonEmpty, "need at least one candidate frequency")
    require(nSegs > 0, "need at least one segment")
    val ss = media.sparkSession
    import ss.implicits._
    val base = freqs.length.toLong
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseWav(bytes) match {
            case Some(w) if w.nFrames >= nSegs =>
              val n = w.nFrames
              val mono = Array.tabulate(n) { f =>
                var s = 0.0
                var c = 0
                while (c < w.channels) {
                  s += w.samples(f * w.channels + c); c += 1
                }
                s / w.channels
              }
              val segLen = n / nSegs
              var fp = 0L
              var mult = 1L
              var k = 0
              while (k < nSegs) {
                val frame = java.util.Arrays
                  .copyOfRange(mono, k * segLen, (k + 1) * segLen)
                val powers =
                  freqs.map(fr => goertzelPower(frame, w.sampleRate, fr))
                val sym = powers.zipWithIndex
                  .maxBy { case (p, i) => (p, -i) }._2
                fp += sym.toLong * mult
                mult *= base
                k += 1
              }
              (id, fp)
            case _ => (id, -1L)
          }
        }
      }.toDF("media_id", "fingerprint")
  }

  /** ======== REAL CODEC LAYER (video: MJPEG-in-AVI) ========
    * AVI is the same RIFF container as WAV; MJPEG stores each video frame
    * as a standalone JPEG inside a `##dc`/`##db` chunk — so frame
    * EXTRACTION is the WAV chunk walk again, and frame DECODE is the
    * existing ImageIO JPEG path. No codec library, no new dependencies.
    * Inter-frame-compressed video (h264 etc.) still falls to the stub.
    */
  private[graft] def isAvi(content: Array[Byte]): Boolean =
    content.length >= 12 &&
      new String(content, 0, 4, "US-ASCII") == "RIFF" &&
      new String(content, 8, 4, "US-ASCII") == "AVI "

  /** Chunk-walking AVI parser: recurses into LIST chunks (`movi` and its
    * `rec ` groupings) and collects every video chunk (`##dc` compressed /
    * `##db` uncompressed) whose payload starts with the JPEG SOI marker,
    * in container order. None on non-AVI or zero decodable frames —
    * callers fall back to the stub, never throw on hostile bytes.
    */
  private[graft] def parseAviFrames(content: Array[Byte])
      : Option[Vector[Array[Byte]]] = {
    if (!isAvi(content)) return None
    val buf = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = Vector.newBuilder[Array[Byte]]
    try {
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = new String(content, pos, 4, "US-ASCII")
          val len = buf.getInt(pos + 4)
          // Long bounds check: a hostile length near Int.MaxValue must not
          // overflow past the end check (same defense as parseWav)
          if (len < 0 || pos + 8L + len > end) return
          if (id == "LIST" && len >= 4) walk(pos + 12, pos + 8 + len)
          else if ((id.endsWith("dc") || id.endsWith("db")) && len >= 2 &&
              (content(pos + 8) & 0xff) == 0xff &&
              (content(pos + 9) & 0xff) == 0xd8)
            frames += content.slice(pos + 8, pos + 8 + len)
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      walk(12, content.length)
      val v = frames.result()
      if (v.isEmpty) None else Some(v)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded-audio stats row (the audio analogue of [[DecodedImage]]). */
  case class DecodedAudio(media_id: Long, channels: Int, sampleRate: Int,
      n_frames: Int, duration_ms: Long, rms: Double)

  /** Real audio decode: per-track stats from the PCM payload; non-WAV
    * audio bytes yield a deterministic md5-stub rms (same contract as
    * the image stub path).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        parseWav(r.content) match {
          case Some(w) =>
            var sum = 0.0
            w.samples.foreach(s => sum += s.toDouble * s)
            val rms = if (w.samples.isEmpty) 0.0
              else math.sqrt(sum / w.samples.length)
            DecodedAudio(r.media_id, w.channels, w.sampleRate, w.nFrames,
              w.durationMs, rms)
          case None =>
            val b = Integer.parseInt(md5Hex(r.content).substring(0, 2), 16)
            DecodedAudio(r.media_id, 1, r.meta.sampleRate, 0,
              r.meta.durationMs, b / 255.0)
        }
      }
    }
  }

  /** Real audio feature: mix to mono, split into `dim` equal windows,
    * emit per-window RMS mapped to [−1, 1) — the energy-envelope
    * downsample, the audio analogue of [[realFeature]]'s luma grid.
    */
  private def audioFeature(w: WavPcm, dim: Int): Array[Float] = {
    val n = w.nFrames
    val mono = Array.tabulate(n) { f =>
      var s = 0.0
      var c = 0
      while (c < w.channels) { s += w.samples(f * w.channels + c); c += 1 }
      s / w.channels
    }
    Array.tabulate(dim) { i =>
      val lo = (i.toLong * n / dim).toInt
      val hi = ((i + 1).toLong * n / dim).toInt
      if (hi <= lo) -1.0f
      else {
        var s = 0.0
        var j = lo
        while (j < hi) { s += mono(j) * mono(j); j += 1 }
        (2.0 * math.sqrt(s / (hi - lo)) - 1.0).toFloat
      }
    }
  }

  /** ======== STUB CODEC LAYER (non-image bytes) ========
    * Deterministic fake decode derived from md5 of the content bytes —
    * md5 (not murmur) on purpose: the oracle gate can recompute every
    * downstream aggregate in SQL (`md5(text)` over the same utf-8 bytes),
    * so the multimodal queries hash-verify instead of rows-only. Audio /
    * video decode would need codec libraries this container lacks, so
    * those kinds always take this path; image bytes only reach it when
    * ImageIO cannot parse them.
    */
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** meanLuma = first md5 byte / 255 ≡ DuckDB
    * `('0x' || substring(md5(text), 1, 2))::INT / 255.0`.
    */
  private def decodeBytes(content: Array[Byte], meta: MediaMeta): DecodedImage =
    imageFormat(content).flatMap(_ => readImage(content)).map(decodeImage)
      .getOrElse {
        val b = Integer.parseInt(md5Hex(content).substring(0, 2), 16)
        DecodedImage(0L, meta.width, meta.height, 3, b / 255.0)
      }

  /** Feature block b supplies 16 elements from the bytes of
    * md5(content ++ "#b"); element = byte/127.5 − 1 ∈ [−1, 1) ≡ DuckDB
    * `CAST(('0x' || substring(md5(text || '#b'), 2i+1, 2))::INT / 127.5
    * - 1 AS FLOAT)`.
    */
  private def fakeBytes(content: Array[Byte], dim: Int): Array[Int] = {
    val blocks = (0 to (dim - 1) / 16)
      .map(b => md5Hex(content ++ s"#$b".getBytes("UTF-8")))
    Array.tabulate(dim) { i =>
      Integer.parseInt(
        blocks(i / 16).substring((i % 16) * 2, (i % 16) * 2 + 2), 16)
    }
  }

  private def fakeFeature(content: Array[Byte], dim: Int): Array[Float] =
    fakeBytes(content, dim).map(b => (b / 127.5 - 1.0).toFloat)
  /** ======== END STUB CODEC LAYER ======== */

  /** Build a media table from a binaryFile scan ([[graft.sources.Sources.readBinary]]):
    * media_id = a stable hash of the file path, kind from the extension,
    * size metadata from the file length. Real deployments replace the
    * metadata derivation with a header probe inside the decode stage.
    */
  def mediaFromBinary(files: DataFrame): Dataset[MediaRow] = {
    import files.sparkSession.implicits._
    val kind = when(col("path").rlike("(?i)\\.(png|jpe?g|gif|bmp|webp)$"), "image")
      .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
      .when(col("path").rlike("(?i)\\.(mp4|mkv|webm|avi|mov)$"), "video")
      .otherwise("binary")
    files.select(
        xxhash64(col("path")).as("media_id"),
        col("content"),
        struct(
          kind.as("kind"),
          lit(0).as("width"), lit(0).as("height"),
          lit(16000).as("sampleRate"),
          // placeholder duration ∝ size until the codec probes the header
          (col("length") / 100).cast("long").as("durationMs"),
          lit("stub").as("codec")).as("meta"))
      .as[MediaRow]
  }

  /** Build a media table from the documents fixture: content = utf-8 bytes
    * (stands in for encoded media), metadata derived deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        struct(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
          (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (col("n_chars") * 10).cast("long").as("durationMs"),
          lit("stub").as("codec")).as("meta"))
      .as[MediaRow]
  }

  /** Decode stage: one codec context per partition, streaming through the
    * rows (no materialization of the whole partition).
    */
  def decodeImages(media: Dataset[MediaRow], partitions: Int = 0): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { rows =>
      // real impl: open ONE codec context here, close at iterator end
      rows.map(r => decodeBytes(r.content, r.meta).copy(media_id = r.media_id))
    }
  }

  /** Feature extraction: binary → fixed-width Array[Float] (the input
    * shape of [[Similarity.cosineTopK]]).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feat = imageFormat(r.content).flatMap(_ => readImage(r.content))
          .map(realFeature(_, dim))
          .orElse(parseWav(r.content).map(audioFeature(_, dim)))
          // MJPEG video: perceptual feature of the first frame — the
          // standard thumbnail-embedding baseline
          .orElse(parseAviFrames(r.content)
            .flatMap(f => readImage(f.head)).map(realFeature(_, dim)))
          .getOrElse(fakeFeature(r.content, dim))
        MediaFeature(r.media_id, feat)
      }
    }
  }

  case class MediaPhash(media_id: Long, h1: Long, h2: Long)

  /** 64-bit average-hash (aHash) per media row, split into two 32-bit
    * halves so hamming distance stays plain `bit_count(xor(...))` BIGINT
    * arithmetic on any engine. Real images: bilinear 8×8 Rec.601 luma
    * grid in INTEGER milli-luma (299R+587G+114B), bit i set iff
    * 64·cell_i > Σcells — integer compares, so the hash is reproducible
    * bit-for-bit with no float-rounding boundary. Stub lane (non-raster
    * bytes): the same rule over the 64 md5-chain feature bytes, which the
    * oracle recomputes from `md5(text || '#b')` hex. mapPartitions codec
    * shape, one row in → one 16-byte row out.
    */
  def imagePhash(media: Dataset[MediaRow]): Dataset[MediaPhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val cells: Array[Long] =
        imageFormat(r.content).flatMap(_ => readImage(r.content)) match {
          case Some(img) =>
            val grid = scaleTo(img, 8, 8)
            Array.tabulate(64) { i =>
              val rgb = grid.getRGB(i % 8, i / 8)
              299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
            }
          case None => fakeBytes(r.content, 64).map(_.toLong)
        }
      val tot = cells.sum
      var h1 = 0L; var h2 = 0L
      var i = 0
      while (i < 64) {
        if (64L * cells(i) > tot) {
          if (i < 32) h1 |= 1L << i else h2 |= 1L << (i - 32)
        }
        i += 1
      }
      MediaPhash(r.media_id, h1, h2)
    })
  }

  /** Perceptual near-dup pairs over [[imagePhash]] hashes: 4×16-bit band
    * equi-join (one shuffle of 24-byte rows, never all-pairs) + exact
    * hamming cut. maxHamming <= 3 < 4 bands ⇒ recall is structurally
    * total by pigeonhole — the same argument as simhash banding.
    */
  def phashNearDuplicates(media: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "pigeonhole recall needs maxHamming < #bands")
    val h = imagePhash(media).toDF.localCheckpoint(true)
    val banded = h.select(col("media_id"), col("h1"), col("h2"),
        posexplode(array(
          col("h1") % 65536, expr("h1 div 65536"),
          col("h2") % 65536, expr("h2 div 65536"))))
      .toDF("media_id", "h1", "h2", "band", "bv")
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.h1").as("a1"), col("a.h2").as("a2"),
        col("b.h1").as("b1"), col("b.h2").as("b2"))
      .distinct()
    pairs
      .withColumn("hamming",
        (bit_count(expr("a1 ^ b1")) + bit_count(expr("a2 ^ b2"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("media_a", "media_b", "hamming")
  }

  /** Frame sampling: one output row per sampled frame — a flatMap, so a
    * 2-hour video becomes many small rows instead of one huge one.
    * MJPEG-in-AVI content yields REAL JPEG frames (each decodable by the
    * ImageIO image path), sampled evenly across the container's frame
    * list at the `everyMs` cadence; anything else keeps the deterministic
    * byte-slice stub (the oracle-recomputable lane).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      val n = math.min(r.meta.durationMs / everyMs, 32L).toInt
      parseAviFrames(r.content) match {
        case Some(frames) =>
          (0 until n).map { i =>
            Frame(r.media_id, i, frames((i.toLong * frames.length / n).toInt))
          }
        case None =>
          // stub slices the content bytes (deterministic, md5-free)
          (0 until n).map { i =>
            val start = (i * math.max(r.content.length / math.max(n, 1), 1))
              .min(math.max(r.content.length - 1, 0))
            Frame(r.media_id, i, r.content.slice(start, start + 16))
          }
      }
    }
  }

  /** Mux pre-encoded JPEG frames into a minimal MJPEG-in-AVI RIFF
    * container — the mirror of [[parseAviFrames]] (same LIST('movi') /
    * '00dc' chunk layout and word alignment real muxers emit). Test and
    * synthesis helper: it makes end-to-end video assertions analytic
    * (build → parse → decode round-trips in-process).
    */
  private[graft] def muxMjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frames.toArray.flatMap(f => chunk("00dc", f))
    val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
      .array()
  }

  /** Solid-gray JPEG frame (real ImageIO encode). */
  private[graft] def solidJpeg(gray: Int, wh: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      wh, wh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until wh; x <- 0 until wh) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  /** Mean integer luma (BT.601 fixed-point) of a decoded frame; None
    * when the bytes don't decode.
    */
  private def meanLuma(jpeg: Array[Byte]): Option[Int] =
    Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))).map { img =>
      var sum = 0L; var n = 0; var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sum += (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
            114L * (p & 0xff)) / 1000L
          n += 1; x += 1
        }
        y += 1
      }
      (sum / n).toInt
    }

  case class SceneCut(media_id: Long, cut_idx: Int, luma_delta: Int)

  /** Hard-cut (scene-change) detection over MJPEG-in-AVI video: mean
    * integer luma per decoded frame, a cut at frame j (≥ 1) when
    * |luma(j) − luma(j−1)| > threshold. Real-decode only — non-AVI rows
    * yield no cuts (scene structure is undefined for the stub lane), and
    * undecodable frames drop out of the luma sequence rather than faking
    * a delta. Codec work rides the same per-partition flatMap shape as
    * the other decode stages — one partition, one codec context, no
    * whole-partition materialization.
    */
  def sceneCuts(media: Dataset[MediaRow], threshold: Int = 64)
      : Dataset[SceneCut] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { r =>
      parseAviFrames(r.content).toSeq.flatMap { frames =>
        val lumas = frames.flatMap(meanLuma)
        (1 until lumas.length).collect {
          case j if (lumas(j) - lumas(j - 1)).abs > threshold =>
            SceneCut(r.media_id, j, (lumas(j) - lumas(j - 1)).abs)
        }
      }
    }
  }

  /** Resize stage: decodable raster content is genuinely rescaled
    * (bilinear `Graphics2D.drawImage`) and re-encoded as PNG; anything
    * ImageIO cannot parse (audio/video/stub text bytes) keeps its content
    * and gets the metadata-only update, preserving the oracle-recomputable
    * gate path.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val rescaled = imageFormat(r.content).flatMap(_ => readImage(r.content))
          .map { img =>
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaleTo(img, w, h), "png", buf)
            buf.toByteArray
          }
        r.copy(content = rescaled.getOrElse(r.content),
          meta = r.meta.copy(width = w, height = h,
            codec = rescaled.fold(r.meta.codec)(_ => "png")))
      }
    }
  }
}
