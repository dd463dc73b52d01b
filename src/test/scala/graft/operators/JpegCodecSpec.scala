package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode vs the JDK's independent libjpeg-derived decoder.
  * JPEG is lossy and T.81 §A.3.3 only bounds IDCT accuracy, so two
  * conforming decoders may legitimately differ by a couple of counts per
  * sample — the cross-check asserts BOTH a small per-sample tolerance and
  * a near-zero mean deviation (a systematic bias or a block/plane
  * misalignment blows up the mean immediately, while IDCT rounding noise
  * does not). Chroma-subsampled color additionally differs by the
  * upsampling filter choice (box here, triangle in libjpeg), so the color
  * fixtures either hold chroma constant (upsampling-invariant) or use
  * smooth gradients with a correspondingly looser bound.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def jdkJpeg(bi: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", out), "JDK must encode jpeg")
    out.toByteArray
  }

  private def jdkDecode(b: Array[Byte]): BufferedImage = {
    val bi = ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(bi != null, "JDK must decode its own jpeg")
    bi
  }

  test("grayscale: decode matches the JDK decoder within IDCT tolerance") {
    val (w, h) = (64, 48)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0,
        (128 + 100 * math.sin(x / 5.0) * math.cos(y / 7.0)).toInt.max(0).min(255))
    val jpeg = jdkJpeg(bi)
    val got = JpegCodec.decode(jpeg)
    assert(got.isDefined, "decode must succeed")
    val img = got.get
    assert((img.width, img.height, img.channels) === ((w, h, 1)))
    val ref = jdkDecode(jpeg)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((img.pixels(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    assert(maxDiff <= 2, s"per-sample IDCT tolerance, got max $maxDiff")
    assert(sumDiff.toDouble / (w * h) <= 0.5, s"mean deviation, got ${sumDiff.toDouble / (w * h)}")
  }

  test("flat blocks decode bit-exactly (DC-only: no IDCT rounding)") {
    val (w, h) = (32, 32)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      // constant per 8x8 block: every AC coefficient is exactly zero
      bi.getRaster.setSample(x, y, 0, 40 + (x / 8) * 50 + (y / 8) * 13)
    val jpeg = jdkJpeg(bi)
    val img = JpegCodec.decode(jpeg).get
    val ref = jdkDecode(jpeg)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xff) === ref.getRaster.getSample(x, y, 0),
        s"DC-only block mismatch at ($x,$y)")
  }

  test("color with constant chroma: upsampling-invariant cross-check") {
    val (w, h) = (48, 40)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // R=G=B → Cb=Cr=128 everywhere: box vs triangle upsampling agree
      val v = (60 + 2 * x + y) % 256
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jpeg = jdkJpeg(bi)
    val img = JpegCodec.decode(jpeg).get
    assert((img.width, img.height, img.channels) === ((w, h, 3)))
    val ref = jdkDecode(jpeg)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((img.pixels((y * w + x) * 3 + c) & 0xff) - rv)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    assert(maxDiff <= 3, s"constant-chroma tolerance, got max $maxDiff")
    assert(sumDiff.toDouble / (w * h * 3) <= 0.6, s"mean ${sumDiff.toDouble / (w * h * 3)}")
  }

  test("real color gradients stay within the subsampled-chroma envelope") {
    val (w, h) = (64, 64)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 3 & 0xff) << 16) | ((y * 3 & 0xff) << 8) | ((x + y) & 0xff))
    val jpeg = jdkJpeg(bi)
    val img = JpegCodec.decode(jpeg).get
    val ref = jdkDecode(jpeg)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((img.pixels((y * w + x) * 3 + c) & 0xff) - rv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    // box vs triangle chroma upsampling differs most at tile edges; smooth
    // gradients keep it small. The mean is the structural check.
    assert(maxDiff <= 12, s"smooth-gradient envelope, got max $maxDiff")
    assert(sumDiff.toDouble / (w * h * 3) <= 1.5, s"mean ${sumDiff.toDouble / (w * h * 3)}")
  }

  test("corrupt and unsupported streams quarantine as None") {
    val bi = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    val jpeg = jdkJpeg(bi)
    assert(JpegCodec.decode(jpeg.take(jpeg.length / 2)).isEmpty, "truncation")
    assert(JpegCodec.decode(Array.fill[Byte](128)(0x33)).isEmpty, "garbage")
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty, "SOI only")
    // flip a byte deep in the entropy stream: decode must return None or a
    // same-shape image, never throw
    val bent = jpeg.clone(); bent(jpeg.length - 8) = (bent(jpeg.length - 8) ^ 0x7f).toByte
    JpegCodec.decode(bent).foreach(img => assert(img.width === 16 && img.height === 16))
  }

  test("header decode and full decode agree on dimensions") {
    val bi = new BufferedImage(33, 21, BufferedImage.TYPE_BYTE_GRAY)
    val jpeg = jdkJpeg(bi)
    val meta = MultimodalOps.parseHeader(7L, "image", jpeg)
    val img = JpegCodec.decode(jpeg).get
    assert((meta.width, meta.height) === ((img.width, img.height)))
  }
}
