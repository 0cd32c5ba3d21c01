package graft.ext

/**
 * Pure-JVM media codecs for the formats whose byte layout is simple
 * enough to parse without any external library — which makes the
 * [[BinaryDecoder]] seam REAL for them instead of stubbed: Netpbm raw
 * images (PGM `P5` grayscale, PPM `P6` RGB) and RIFF/WAV PCM16 audio.
 * These are the interchange formats a media ingest normalizes INTO
 * before heavier codecs run, so "decode + extract features at corpus
 * scale" is exercised end-to-end with real parsing, real malformed-input
 * handling, and oracle-checkable outputs.
 *
 * Every parser here is driver-free, allocation-light, and returns exact
 * INTEGER moments (count / sum / sum-of-squares as doubles — exact below
 * 2^53) rather than pre-divided means: the caller does the one float
 * division, so a SQL oracle that recomputes the same moments from first
 * principles matches bit-for-bit. Malformed input returns `None` — a
 * corrupt asset must become a NULL feature row, never a task failure
 * that kills a 100-TB decode pass.
 *
 * The reference has no media surface (a log ETL,
 * `/root/reference/sree-etl-tdk-glue-job.py`); this extends SURVEY.md
 * §2.11 X4 from seam to operator.
 */
object MediaCodec {

  /** Parsed Netpbm raster moments: per-channel pixel sum and sum of
    * squares (channels = 1 for P5, 3 for P6), all exact integers. */
  final case class NetpbmStats(
      width: Int, height: Int, channels: Int,
      sums: Array[Long], sqSums: Array[Long])

  /** WAV PCM16 moments: format fields plus exact sample moments across
    * all channels. */
  final case class WavStats(
      sampleRate: Int, channels: Int, nSamples: Long,
      sampleSum: Long, sampleSqSum: Long)

  // ---- Netpbm (PGM P5 / PPM P6, raw variants, maxval <= 255) ----

  /** Parsed Netpbm header: dimensions, maxval, and the byte offset of
    * the first raster byte. The raster is GUARANTEED in-bounds
    * (`rasterPos + w·h·channels <= payload length`). */
  private[ext] final case class NetpbmHeader(
      width: Int, height: Int, channels: Int, maxval: Int, rasterPos: Int)

  /** The header grammar shared by [[parseNetpbm]] and
    * [[resizeNetpbmNearest]]: `#` comments anywhere in inter-token
    * whitespace, any whitespace separators, exactly ONE whitespace byte
    * after maxval before the raster. None for wrong magic, malformed /
    * overflowing dimensions, maxval outside 1..255, or a truncated
    * raster. Trailing bytes after the raster are tolerated. */
  private[ext] def parseNetpbmHeader(
      bytes: Array[Byte]): Option[NetpbmHeader] =
    parseNetpbmHeaderAt(bytes, 0)

  /** [[parseNetpbmHeader]] starting at `start` — the multi-frame walk
    * entry point: a concatenated-Netpbm container is parsed frame by
    * frame by re-entering here at each frame's first byte. */
  private[ext] def parseNetpbmHeaderAt(
      bytes: Array[Byte], start: Int): Option[NetpbmHeader] = {
    if (bytes == null || start < 0 || bytes.length < start + 2 ||
        bytes(start) != 'P') return None
    val channels = bytes(start + 1) match {
      case '5' => 1
      case '6' => 3
      case _   => return None
    }
    var pos = start + 2
    // read the next decimal token, skipping whitespace and # comments
    def nextInt(): Option[Int] = {
      while (pos < bytes.length &&
          (isSpace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#') { // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else pos += 1
      }
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    val hdr = for {
      w <- nextInt(); if w > 0
      h <- nextInt(); if h > 0
      maxval <- nextInt(); if maxval >= 1 && maxval <= 255
      // exactly one whitespace byte separates maxval from the raster —
      // and it must BE whitespace: skipping an arbitrary byte here would
      // shift the raster read one byte late and return wrong moments
      // for a malformed header instead of None
      if pos < bytes.length && isSpace(bytes(pos))
    } yield {
      val rasterPos = pos + 1
      val n = w.toLong * h * channels
      if (rasterPos + n > bytes.length || n > Int.MaxValue) None
      else Some(NetpbmHeader(w, h, channels, maxval, rasterPos))
    }
    hdr.flatten
  }

  /** Parse a raw PGM (`P5`) or PPM (`P6`) payload to exact raster
    * moments (see [[parseNetpbmHeader]] for the accepted grammar). */
  def parseNetpbm(bytes: Array[Byte]): Option[NetpbmStats] =
    parseNetpbmHeader(bytes).map { hd =>
      val n = hd.width.toLong * hd.height * hd.channels
      val sums = new Array[Long](hd.channels)
      val sqSums = new Array[Long](hd.channels)
      var i = 0
      while (i < n) {
        val v = (bytes(hd.rasterPos + i) & 0xff).toLong
        val c = (i % hd.channels).toInt
        sums(c) += v
        sqSums(c) += v * v
        i += 1
      }
      NetpbmStats(hd.width, hd.height, hd.channels, sums, sqSums)
    }

  /** One sampled frame of a concatenated-Netpbm container: the frame's
    * 0-based index in the container plus its exact raster moments
    * (grayscale: sum and sum of squares over all pixels). */
  final case class FrameStats(
      idx: Int, width: Int, height: Int, sum: Long, sqSum: Long)

  /**
   * Frame-sample a concatenated-Netpbm "animation" container — the
   * hand-parseable stand-in for a video bitstream: frames are raw P5
   * payloads laid end to end (each a complete header + raster, the
   * multi-image Netpbm convention), and every `every`-th frame
   * (0, every, 2·every, …) is decoded to exact moments while skipped
   * frames are only WALKED (header parse + raster-length hop, no pixel
   * reads — the cheap seek a real container's frame index would give).
   * None for an empty container, a non-grayscale frame, any malformed
   * frame, or trailing garbage — a container is decodable as a whole or
   * not at all (a half-parsed video must not silently truncate).
   */
  def parseNetpbmFrames(
      bytes: Array[Byte], every: Int): Option[Seq[FrameStats]] = {
    if (every <= 0 || bytes == null || bytes.length == 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
    var pos = 0
    var idx = 0
    while (pos < bytes.length) {
      parseNetpbmHeaderAt(bytes, pos) match {
        case Some(hd) if hd.channels == 1 =>
          val n = hd.width * hd.height
          if (idx % every == 0) {
            var sum = 0L
            var sq = 0L
            var i = 0
            while (i < n) {
              val v = (bytes(hd.rasterPos + i) & 0xff).toLong
              sum += v; sq += v * v; i += 1
            }
            out += FrameStats(idx, hd.width, hd.height, sum, sq)
          }
          pos = hd.rasterPos + n
          idx += 1
        case _ => return None
      }
    }
    Some(out.toSeq)
  }

  /**
   * Nearest-neighbor resize of a raw Netpbm payload, re-encoded in the
   * SAME format (P5→P5, P6→P6, maxval preserved) with the canonical
   * single-spaced header `P<n>\n<w> <h>\n<maxval>\n` — comments from the
   * source header do NOT survive (the output is a fresh encode, not a
   * patch). Source pixel for output `(x, y)` is
   * `(⌊x·srcW/outW⌋, ⌊y·srcH/outH⌋)` — pure integer math, so any engine
   * (or oracle) reproduces the exact output bytes. None for unparseable
   * payloads or non-positive target dimensions.
   */
  def resizeNetpbmNearest(
      bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    parseNetpbmHeader(bytes).flatMap { hd =>
      val outN = outW.toLong * outH * hd.channels
      if (outN > Int.MaxValue) return None
      val magic = if (hd.channels == 1) "P5" else "P6"
      val header = s"$magic\n$outW $outH\n${hd.maxval}\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + outN.toInt)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      var o = header.length
      while (y < outH) {
        val sy = (y.toLong * hd.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * hd.width / outW).toInt
          val src = hd.rasterPos +
            (sy.toLong * hd.width + sx).toInt * hd.channels
          var c = 0
          while (c < hd.channels) {
            out(o) = bytes(src + c); o += 1; c += 1
          }
          x += 1
        }
        y += 1
      }
      Some(out)
    }
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' ||
      b == 0x0b

  // ---- BMP (BITMAPINFOHEADER, uncompressed 24-bit BI_RGB) ----

  /** Parsed BMP raster moments: per-STORAGE-channel pixel sum and sum
    * of squares in the file's B, G, R order (index 0 = blue), all
    * exact integers. `topDown` records a negative biHeight (row order
    * never affects moments, but callers echoing metadata need it). */
  final case class BmpStats(
      width: Int, height: Int, topDown: Boolean,
      sums: Array[Long], sqSums: Array[Long])

  /**
   * Parse an uncompressed 24-bit BMP payload (`BM` magic,
   * BITMAPINFOHEADER-or-larger DIB header, `biCompression = 0`,
   * `biBitCount = 24`, `biPlanes = 1`) to exact raster moments. Rows
   * are 4-byte aligned — the per-row pad bytes are skipped, never
   * summed — and a negative `biHeight` (top-down row order) is
   * accepted since moments are row-order-invariant. None for: wrong
   * magic, short/odd headers, other bit depths or compressions,
   * non-positive width, zero height, a pixel-array offset inside the
   * headers, or a raster that overruns the payload. Trailing bytes
   * after the raster are tolerated (writers append color profiles).
   */
  def parseBmp(bytes: Array[Byte]): Option[BmpStats] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return None // BITMAPINFOHEADER or an extension
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val planes = le16(bytes, 26)
    val bits = le16(bytes, 28)
    val comp = le32(bytes, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      planes != 1 || bits != 24 || comp != 0) return None
    val h = math.abs(hRaw)
    val stride = (w.toLong * 3 + 3) / 4 * 4
    if (stride * h > Int.MaxValue) return None
    if (dataOff.toLong < 14L + hdrSize.toLong ||
      dataOff.toLong + stride * h > bytes.length) return None
    val sums = new Array[Long](3)
    val sqSums = new Array[Long](3)
    var y = 0
    while (y < h) {
      var p = dataOff + (y * stride).toInt
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val v = (bytes(p) & 0xff).toLong
          sums(c) += v
          sqSums(c) += v * v
          p += 1; c += 1
        }
        x += 1
      }
      y += 1
    }
    Some(BmpStats(w, h, hRaw < 0, sums, sqSums))
  }

  // ---- RIFF/WAV, PCM16 little-endian ----

  /** Parse a RIFF/WAVE payload with a PCM (`audioFormat = 1`) 16-bit
    * `fmt ` chunk. Walks the chunk list (chunks are word-aligned: odd
    * sizes carry a pad byte), so writers that interleave `LIST`/`fact`
    * chunks parse fine. Returns None for: missing RIFF/WAVE magic,
    * no fmt/data chunk, non-PCM format, non-16-bit samples, zero
    * channels/rate, or a data chunk that overruns the payload. */
  def parseWav(bytes: Array[Byte]): Option[WavStats] = {
    if (bytes == null || bytes.length < 12) return None
    if (!hasTag(bytes, 0, "RIFF") || !hasTag(bytes, 8, "WAVE")) return None
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[(Int, Int)] = None // (offset, byteLen)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (hasTag(bytes, pos, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(bytes, pos + 8)
        val channels = le16(bytes, pos + 10)
        val rate = le32(bytes, pos + 12)
        val bits = le16(bytes, pos + 22)
        if (audioFormat != 1 || bits != 16 || channels <= 0 || rate <= 0)
          return None
        fmt = Some((channels, rate))
      } else if (hasTag(bytes, pos, "data")) {
        data = Some((pos + 8, size))
      }
      pos += 8 + size + (size & 1) // word alignment pad
    }
    for {
      (channels, rate) <- fmt
      (off, len) <- data
    } yield {
      val n = len / 2 // complete 16-bit samples only
      var sum = 0L
      var sq = 0L
      var i = 0
      while (i < n) {
        val v = (le16(bytes, off + 2 * i).toShort).toLong
        sum += v
        sq += v * v
        i += 1
      }
      WavStats(rate, channels, n.toLong, sum, sq)
    }
  }

  private def hasTag(b: Array[Byte], pos: Int, tag: String): Boolean =
    pos + 4 <= b.length &&
      b(pos) == tag.charAt(0) && b(pos + 1) == tag.charAt(1) &&
      b(pos + 2) == tag.charAt(2) && b(pos + 3) == tag.charAt(3)

  private def le16(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
      ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
}
