package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaCodec

/** The multimodal codecs must produce REAL formats and parse REAL
  * encoder output — proven by round-tripping against the JDK's own
  * independent codecs (`javax.imageio`, `javax.sound.sampled`), which
  * share zero code with ours. A mirrored offset/endianness bug in our
  * encoder+parser pair would survive the arithmetic oracle; it cannot
  * survive these cross-checks. */
class MediaCodecSpec extends AnyFunSuite {

  test("our PNG decodes in ImageIO pixel-exactly") {
    val (w, h, seed) = (37, 21, 12345L)
    val bytes = MediaCodec.encodePng(w, h, seed)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == MediaCodec.pixel(seed, x, y),
        s"pixel ($x,$y) mismatch")
  }

  test("our parser reads ImageIO-encoded PNG headers") {
    val img = new java.awt.image.BufferedImage(41, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 4, 0xdeadbe)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val info = MediaCodec.pngInfo(out.toByteArray)
    assert(info.isDefined, "our parser rejected a JDK-written PNG")
    assert(info.get.width == 41 && info.get.height == 17)
    assert(info.get.bitDepth == 8)
  }

  test("our parser reads the JPEG SOF dims the JDK encoder writes") {
    for ((w, h) <- Seq((8, 8), (127, 9), (64, 120))) {
      val bytes = MediaCodec.encodeJpeg(w, h, 99L)
      val info = MediaCodec.jpegInfo(bytes)
      assert(info.isDefined, s"no SOF found in JDK JPEG ${w}x$h")
      assert(info.get.width == w && info.get.height == h, s"dims mismatch at ${w}x$h")
      assert(info.get.components == 1, "grayscale source must encode 1 component")
      // and the JDK can read its own bytes back at the same dims
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("MJPEG split: frame spans are exact and each span re-parses to its own dims") {
    val dims = Seq((16, 9), (33, 47), (8, 8), (120, 11))
    val frames = dims.zipWithIndex.map { case ((w, h), i) => MediaCodec.encodeJpeg(w, h, i) }
    val stream = frames.reduce(_ ++ _)
    val spans = MediaCodec.mjpegFrames(stream)
    assert(spans.length == dims.length, s"expected ${dims.length} frames, got ${spans.length}")
    // spans must tile the stream exactly: concatenation preserved
    assert(spans.head._1 == 0)
    spans.sliding(2).foreach { case Array((o1, l1), (o2, _)) => assert(o1 + l1 == o2); case _ => }
    assert(spans.last._1 + spans.last._2 == stream.length)
    spans.zip(dims).foreach { case ((off, len), (w, h)) =>
      val info = MediaCodec.jpegInfo(stream, off, off + len)
      assert(info.exists(i => i.width == w && i.height == h), s"frame at $off: wrong dims")
      assert(len == frames(spans.indexOf((off, len))).length)
    }
    // a truncated tail frame is dropped, not mis-split
    val truncated = MediaCodec.mjpegFrames(stream.dropRight(4))
    assert(truncated.length == dims.length - 1)
  }

  test("our WAV plays in javax.sound: format and frame count match") {
    val bytes = MediaCodec.encodeWav(16000, 2, 345, 7L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2 && fmt.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 345L)
  }

  test("our parser reads a javax.sound-written WAV") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val pcm = new Array[Byte](200 * 2)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 200)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val info = MediaCodec.wavInfo(out.toByteArray)
    assert(info.isDefined, "our parser rejected a JDK-written WAV")
    assert(info.get.sampleRate == 22050 && info.get.channels == 1 && info.get.bitsPerSample == 16)
    assert(info.get.nFrames == 200)
    assert(info.get.durationMs == 200L * 1000 / 22050)
  }

  test("parsers reject non-media bytes instead of mis-parsing") {
    val junk = "this is not a media file, just text".getBytes("UTF-8")
    assert(MediaCodec.pngInfo(junk).isEmpty)
    assert(MediaCodec.jpegInfo(junk).isEmpty)
    assert(MediaCodec.wavInfo(junk).isEmpty)
    assert(MediaCodec.mjpegFrames(junk).isEmpty)
    // and a PNG is not a JPEG / WAV
    val png = MediaCodec.encodePng(9, 9, 1L)
    assert(MediaCodec.jpegInfo(png).isEmpty && MediaCodec.wavInfo(png).isEmpty)
  }

  test("ns_mm_features end-to-end: decoded fields equal the doc_id arithmetic") {
    val spark = SparkSuite.spark
    val rows = graft.operators.Multimodal.features.run(spark, SparkSuite.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      (id % 3) match {
        case 0 =>
          assert(r.getString(1) == "image")
          assert(r.getInt(2) == 8 + id * 13 % 120 && r.getInt(3) == 8 + id * 29 % 120)
          assert(r.getInt(6) == 1)
        case 1 =>
          assert(r.getString(1) == "audio")
          val rate = Array(8000, 11025, 16000, 22050)((id * 7 % 4).toInt)
          val nf = 64 + id * 17 % 441
          assert(r.getInt(4) == rate && r.getInt(5) == 1 + id * 5 % 2)
          assert(r.getInt(6) == nf && r.getLong(7) == nf * 1000 / rate)
        case _ =>
          assert(r.getString(1) == "video")
          assert(r.getInt(2) == 8 + id * 13 % 120 && r.getInt(3) == 8 + id * 7 % 120)
          assert(r.getInt(6) == 1 + id * 3 % 6)
      }
    }
  }
}
