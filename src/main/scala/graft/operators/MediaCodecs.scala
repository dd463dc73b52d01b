package graft.operators

/** REAL full-payload media decode for the formats whose layouts are public
  * specification text and whose only compression primitive (DEFLATE) ships
  * in the JDK — closing the r9/r10 "full-payload decode is a stub" caveat
  * for PNG and WAV:
  *
  *   - PNG (ISO/IEC 15948): signature → chunk walk with CRC-32 verification
  *     → IDAT concatenation → `java.util.zip.Inflater` → per-scanline
  *     unfilter (None/Sub/Up/Average/Paeth, §9.2) → interleaved 8-bit
  *     pixels. Gray / gray+alpha / RGB / RGBA at bit depth 8,
  *     non-interlaced (Adam7 and sub-byte depths quarantine — the decode
  *     contract everywhere in this engine is "None, never a throw, never a
  *     wrong pixel").
  *   - WAV (RIFF): fmt/data chunk walk (the header walk [[MultimodalOps]]
  *     already does) → PCM16LE samples.
  *
  * JPEG pixel decode is [[JpegCodec]] (r11): baseline Huffman+DCT, the
  * last stub closed. Encoders for PNG/WAV are included so specs and queries
  * can synthesize REAL container bytes executor-side and drive them
  * through the exact deployed decode path (MultimodalOpsSpec additionally
  * cross-checks against the JDK's independent ImageIO codec in both
  * directions).
  *
  * Hostile-input posture: chunk lengths are unsigned-checked, the decoded
  * size is bounded BEFORE inflation (`maxPixelBytes` — a 100-byte payload
  * claiming a 2^31-pixel IHDR must not allocate), CRC mismatches and short
  * streams quarantine. One corrupt blob must never fail (or inflate-bomb)
  * a 100 TB decode stage.
  */
object MediaCodecs {

  /** Row-major, channel-interleaved 8-bit samples. channels ∈ {1,2,3,4}:
    * gray, gray+alpha, RGB, RGBA.
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decoded-size cap: features over thumbnails/tiles never need more, and
    * an IHDR-claimed size is attacker-controlled input until the inflate
    * proves it. 64 MiB ≈ a 4096×4096 RGBA tile.
    */
  val maxPixelBytes: Long = 64L * 1024 * 1024

  /** Area-average (box) downscale to `ow × oh` — the resize stage of a
    * multimodal feature pipeline (thumbnails, perceptual-hash inputs).
    * Output pixel (x, y, c) is the floor of the mean over the input rect
    * [⌊xW/ow⌋, ⌊(x+1)W/ow⌋) × [⌊yH/oh⌋, ⌊(y+1)H/oh⌋) of channel c —
    * exact integer arithmetic, deterministic across platforms (no
    * float resampling kernels), any channel count, any (smaller or
    * equal) target size.
    */
  def boxDownscale(img: Image, ow: Int, oh: Int): Image = {
    require(ow >= 1 && oh >= 1 && ow <= img.width && oh <= img.height,
      s"boxDownscale: target ${ow}x$oh must fit ${img.width}x${img.height}")
    val c = img.channels
    val out = new Array[Byte](ow * oh * c)
    var y = 0
    while (y < oh) {
      val y0 = y * img.height / oh
      val y1 = (y + 1) * img.height / oh
      var x = 0
      while (x < ow) {
        val x0 = x * img.width / ow
        val x1 = (x + 1) * img.width / ow
        var ch = 0
        while (ch < c) {
          var sum = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              sum += img.pixels((yy * img.width + xx) * c + ch) & 0xff
              xx += 1
            }
            yy += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          out((y * ow + x) * c + ch) = (sum / n).toByte
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Image(ow, oh, c, out)
  }

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Magic-sniffing image decode: PNG → [[decodePng]], JPEG →
    * [[JpegCodec.decode]], anything else → None. The deployment-facing
    * entry a decode stage maps over a binary column.
    */
  def decodeImage(b: Array[Byte]): Option[Image] =
    if (b.length >= 8 && b.take(8).sameElements(pngSig)) decodePng(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decode(b)
    else None

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  // ---------------------------------------------------------------- PNG

  /** Full PNG decode per the object doc. None = quarantine (bad signature,
    * unsupported shape, CRC mismatch, truncated/oversized stream).
    */
  def decodePng(b: Array[Byte]): Option[Image] = {
    if (b.length < 8 + 25 || !b.take(8).sameElements(pngSig)) return None
    var i = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1; var interlace = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (!sawIend && i + 12 <= b.length) {
      val len = u32be(b, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return None
      val n = len.toInt
      val typ = new String(b, i + 4, 4, "US-ASCII")
      // §5.3: the CRC covers chunk type + data
      crc.reset(); crc.update(b, i + 4, 4 + n)
      if (crc.getValue != u32be(b, i + 8 + n)) return None
      typ match {
        case "IHDR" =>
          if (n < 13) return None
          w = u32be(b, i + 8).min(Int.MaxValue).toInt
          h = u32be(b, i + 12).min(Int.MaxValue).toInt
          bitDepth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
          if ((b(i + 18) & 0xff) != 0 || (b(i + 19) & 0xff) != 0) return None
          interlace = b(i + 20) & 0xff
          sawIhdr = true
        case "IDAT" => idat.write(b, i + 8, n)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) don't affect pixels
      }
      i += 12 + n
    }
    if (!sawIhdr || !sawIend || w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0)
      return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None // 3 = palette: needs PLTE indirection, quarantine
    }
    val stride = w.toLong * channels
    val rawLen = (stride + 1) * h
    if (rawLen > maxPixelBytes) return None
    val raw = inflate(idat.toByteArray, rawLen.toInt)
    if (raw == null) return None

    // §9.2 unfilter, scanline by scanline; a = left, bUp = up, c = up-left
    val out = new Array[Byte](stride.toInt * h)
    val s = stride.toInt
    var y = 0
    while (y < h) {
      val ft = raw(y * (s + 1)) & 0xff
      val ro = y * (s + 1) + 1
      val oo = y * s
      var x = 0
      while (x < s) {
        val rv = raw(ro + x) & 0xff
        val a = if (x >= channels) out(oo + x - channels) & 0xff else 0
        val bUp = if (y > 0) out(oo - s + x) & 0xff else 0
        val c = if (y > 0 && x >= channels) out(oo - s + x - channels) & 0xff else 0
        val v = ft match {
          case 0 => rv
          case 1 => rv + a
          case 2 => rv + bUp
          case 3 => rv + ((a + bUp) >> 1)
          case 4 =>
            // Paeth predictor (§9.4)
            val p = a + bUp - c
            val pa = math.abs(p - a); val pb = math.abs(p - bUp); val pc = math.abs(p - c)
            rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else c)
          case _ => return None
        }
        out(oo + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, channels, out))
  }

  /** Inflate exactly `expected` bytes; null on short/overlong/corrupt
    * streams (the bound was proven against [[maxPixelBytes]] upstream).
    */
  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        off += n
      }
      if (off != expected) return null
      // a stream with trailing pixels beyond the IHDR-claimed size is
      // corrupt (or hostile) — quarantine rather than silently crop
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return null
      out
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Minimal conforming PNG encoder (bit depth 8, non-interlaced, filter 0
    * on every scanline, one IDAT): enough to synthesize REAL container
    * bytes that any PNG decoder — this one or ImageIO — reads back
    * bit-exactly. channels picks the color type (1/2/3/4 → 0/4/2/6).
    */
  def encodePng(img: Image): Array[Byte] = {
    require(Set(1, 2, 3, 4)(img.channels), s"channels ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels, "pixel buffer size")
    val colorType = img.channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val s = img.width * img.channels
    val raw = new Array[Byte]((s + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // raw(y*(s+1)) = 0: filter None
      System.arraycopy(img.pixels, y * s, raw, y * (s + 1) + 1, s)
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    val zOut = new java.io.ByteArrayOutputStream()
    try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](8192)
      while (!def_.finished()) zOut.write(buf, 0, def_.deflate(buf))
    } finally def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(len), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- WAV

  /** PCM16LE WAV decode: RIFF walk to fmt (must be audioFormat 1 /
    * 16-bit) and data; None on anything else. Sample order is the
    * container's interleaved frame order.
    */
  def decodeWavPcm16(b: Array[Byte]): Option[Audio] = {
    def ascii(i: Int, s: String) =
      b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)
    def u16le(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32le(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var i = 12
    var rate = -1; var channels = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= b.length) {
      val size = u32le(i + 4)
      if (ascii(i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        fmtCode = u16le(i + 8); channels = u16le(i + 10)
        rate = u32le(i + 12).min(Int.MaxValue).toInt; bits = u16le(i + 22)
      } else if (ascii(i, "data")) {
        dataOff = i + 8; dataLen = math.min(size, (b.length - dataOff).toLong)
      }
      val next = i.toLong + 8 + size + (size & 1)
      if (next > b.length) i = b.length else i = next.toInt
    }
    if (fmtCode != 1 || bits != 16 || rate <= 0 || channels <= 0 || dataOff < 0) return None
    if (dataLen / 2 > maxPixelBytes / 2) return None
    val n = (dataLen / 2).toInt
    val samples = new Array[Short](n)
    var j = 0
    while (j < n) {
      samples(j) = ((b(dataOff + 2 * j) & 0xff) | (b(dataOff + 2 * j + 1) << 8)).toShort
      j += 1
    }
    Some(Audio(rate, channels, samples))
  }

  /** Canonical 44-byte-header PCM16LE WAV encoder. */
  def encodeWavPcm16(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = a.channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(a.channels.toShort)
      .putInt(a.sampleRate).putInt(a.sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(bb.putShort)
    bb.array()
  }
}
