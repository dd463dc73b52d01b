package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs.{Audio, Image}

/** Real PNG/WAV payload codecs (r11). The PNG tests cross-check against
  * the JDK's OWN ImageIO codec in BOTH directions — ImageIO-encoded bytes
  * (whose encoder picks its own scanline filters, exercising Sub/Up/
  * Average/Paeth in our unfilter) must decode to the exact pixels, and
  * our encoder's bytes must read back identically through ImageIO. Two
  * independent implementations agreeing pixel-for-pixel is the codec
  * equivalent of the DuckDB oracle discipline.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int, c: Int, seed: Int): Array[Byte] = {
    val p = new Array[Byte](w * h * c)
    var i = 0
    while (i < p.length) { p(i) = (((seed * 31 + i * 7919) >>> 3) & 0xff).toByte; i += 1 }
    p
  }

  private def imageIoPng(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "JDK must encode png")
    out.toByteArray
  }

  test("ImageIO-encoded gray PNG decodes to exact pixels") {
    val (w, h) = (37, 23)
    val pix = pattern(w, h, 1, 5)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    // raster samples, NOT setRGB: TYPE_BYTE_GRAY's sRGB<->linear colorspace
    // conversion would distort the stored bytes
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, pix(y * w + x) & 0xff)
    val got = MediaCodecs.decodePng(imageIoPng(bi))
    assert(got.isDefined, "decode must succeed")
    val img = got.get
    assert((img.width, img.height, img.channels) === ((w, h, 1)))
    assert(img.pixels.toSeq === pix.toSeq)
  }

  test("ImageIO-encoded RGB PNG decodes to exact pixels (filters exercised)") {
    val (w, h) = (64, 48)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      // gradients force the encoder toward non-trivial filter choices
      bi.setRGB(x, y, ((x * 4 & 0xff) << 16) | ((y * 5 & 0xff) << 8) | ((x + y) * 3 & 0xff))
    val got = MediaCodecs.decodePng(imageIoPng(bi))
    assert(got.isDefined)
    val img = got.get
    assert((img.width, img.height, img.channels) === ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val rgb = bi.getRGB(x, y)
      assert((img.pixels(o) & 0xff) === ((rgb >> 16) & 0xff), s"R at ($x,$y)")
      assert((img.pixels(o + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) === (rgb & 0xff), s"B at ($x,$y)")
    }
  }

  test("our PNG encoder reads back identically through ImageIO (gray + RGBA)") {
    for ((c, biType) <- Seq(1 -> BufferedImage.TYPE_BYTE_GRAY,
                            4 -> BufferedImage.TYPE_INT_ARGB)) {
      val (w, h) = (29, 17)
      val pix = pattern(w, h, c, 11 + c)
      val png = MediaCodecs.encodePng(Image(w, h, c, pix))
      val bi = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(bi != null, s"ImageIO must read our $c-channel png")
      assert((bi.getWidth, bi.getHeight) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        if (c == 1) {
          // raster sample, not getRGB: see the gray-write note above
          val v = pix(y * w + x) & 0xff
          assert(bi.getRaster.getSample(x, y, 0) === v, s"gray at ($x,$y)")
        } else {
          val rgb = bi.getRGB(x, y)
          val o = (y * w + x) * 4
          assert(((rgb >> 24) & 0xff) === (pix(o + 3) & 0xff), s"A at ($x,$y)")
          assert(((rgb >> 16) & 0xff) === (pix(o) & 0xff), s"R at ($x,$y)")
          assert(((rgb >> 8) & 0xff) === (pix(o + 1) & 0xff), s"G at ($x,$y)")
          assert((rgb & 0xff) === (pix(o + 2) & 0xff), s"B at ($x,$y)")
        }
      }
      // and through our own decoder, bit-identically
      assert(MediaCodecs.decodePng(png).get.pixels.toSeq === pix.toSeq)
    }
  }

  test("corrupt PNGs quarantine as None, never throw") {
    val good = MediaCodecs.encodePng(Image(8, 8, 1, pattern(8, 8, 1, 3)))
    // flip one IDAT payload byte: CRC check must reject
    val bad = good.clone(); bad(good.length - 15) = (bad(good.length - 15) ^ 0x55).toByte
    assert(MediaCodecs.decodePng(bad).isEmpty, "CRC mismatch quarantines")
    assert(MediaCodecs.decodePng(good.take(good.length - 20)).isEmpty, "truncation quarantines")
    assert(MediaCodecs.decodePng(Array.fill[Byte](64)(0x11)).isEmpty, "bad signature quarantines")
    // hostile IHDR: claim a giant image over a tiny stream — the size
    // bound must reject before any allocation-scale work
    val hostile = good.clone()
    hostile(16) = 0x7f.toByte // width high byte → ~2^31
    assert(MediaCodecs.decodePng(hostile).isEmpty, "CRC now wrong; even with a fixed CRC the bound rejects")
  }

  test("WAV PCM16 encode/decode round trip is sample-exact") {
    val samples = Array.tabulate(300)(i => (math.sin(i / 7.0) * 12000).toShort)
    val wav = MediaCodecs.encodeWavPcm16(Audio(16000, 1, samples))
    val got = MediaCodecs.decodeWavPcm16(wav)
    assert(got.isDefined)
    assert(got.get.sampleRate === 16000 && got.get.channels === 1)
    assert(got.get.samples.toSeq === samples.toSeq)
    // stereo
    val st = MediaCodecs.encodeWavPcm16(Audio(44100, 2, samples))
    assert(MediaCodecs.decodeWavPcm16(st).get.channels === 2)
  }

  test("non-PCM16 and corrupt WAVs quarantine") {
    val wav = MediaCodecs.encodeWavPcm16(Audio(8000, 1, Array[Short](1, 2, 3)))
    val f32 = wav.clone(); f32(20) = 3 // fmt code 3 = IEEE float
    assert(MediaCodecs.decodeWavPcm16(f32).isEmpty)
    assert(MediaCodecs.decodeWavPcm16(wav.take(30)).isEmpty)
    assert(MediaCodecs.decodeWavPcm16(Array.fill[Byte](64)(0x22)).isEmpty)
  }

  test("boxDownscale: exact integer area means, hand-computed") {
    // 4x2 gray -> 2x1: each output cell is the floor-mean of a 2x2 block
    val in = MediaCodecs.Image(4, 2, 1,
      Array[Byte](10, 20, 100, 101,
                  30, 43, 102, 200.toByte))
    val out = MediaCodecs.boxDownscale(in, 2, 1)
    assert((out.width, out.height, out.channels) === ((2, 1, 1)))
    // (10+20+30+43)/4 = 25 (floor of 25.75); (100+101+102+200)/4 = 125
    assert(out.pixels.map(_ & 0xff).toSeq === Seq(25, 125))
  }

  test("boxDownscale: uneven ratios partition the input exactly once") {
    // 5x3 -> 2x2: rects [0,2)x[0,1), [2,5)x[0,1), [0,2)x[1,3), [2,5)x[1,3)
    val pix = Array.tabulate(15)(i => (i * 10).toByte)
    val in = MediaCodecs.Image(5, 3, 1, pix)
    val out = MediaCodecs.boxDownscale(in, 2, 2)
    def mean(xs: Seq[Int]): Int = xs.sum / xs.length
    val p = (x: Int, y: Int) => pix(y * 5 + x) & 0xff
    assert(out.pixels.map(_ & 0xff).toSeq === Seq(
      mean(for (y <- 0 until 1; x <- 0 until 2) yield p(x, y)),
      mean(for (y <- 0 until 1; x <- 2 until 5) yield p(x, y)),
      mean(for (y <- 1 until 3; x <- 0 until 2) yield p(x, y)),
      mean(for (y <- 1 until 3; x <- 2 until 5) yield p(x, y))))
  }

  test("boxDownscale: multi-channel stays channel-separated") {
    // 2x2 RGB -> 1x1: per-channel means, no cross-channel bleed
    val in = MediaCodecs.Image(2, 2, 3, Array[Byte](
      10, 100, 200.toByte, 20, 110, 210.toByte,
      30, 120, 220.toByte, 40, 130.toByte, 230.toByte))
    val out = MediaCodecs.boxDownscale(in, 1, 1)
    assert(out.pixels.map(_ & 0xff).toSeq === Seq(25, 115, 215))
  }
}
