package graft.operators

/** Baseline JPEG decode (ITU-T T.81, sequential DCT, Huffman, 8-bit) —
  * closing the final full-payload-decode stub (r11). Pure JVM, no codec
  * dependency: marker parse → canonical Huffman tables (§C.2) → entropy
  * decode with byte-unstuffing and restart markers (§B.1.1.5, §E.2.4) →
  * dequantize + dezigzag → separable double-precision IDCT (§A.3.3) →
  * box chroma upsampling → YCbCr→RGB (the JFIF/BT.601 full-range
  * transform).
  *
  * Supported: SOF0 baseline, 1-component grayscale and 3-component YCbCr
  * at any sampling factors (4:4:4 / 4:2:2 / 4:2:0 / …), 8/16-bit DQT,
  * DRI/RSTn. Quarantined as None (never a throw): progressive (SOF2),
  * arithmetic coding, 12-bit precision, CMYK, truncated/corrupt streams,
  * dimension claims past [[MediaCodecs.maxPixelBytes]].
  *
  * Precision note: JPEG is lossy and T.81 does not pin one IDCT — two
  * conforming decoders may differ by ±1–2 per sample (§A.3.3 accuracy
  * bounds). The double-precision IDCT here is well inside the conformance
  * envelope; MediaCodecsSpec cross-checks against the JDK's independent
  * libjpeg-derived decoder within that tolerance (and bit-exactly for DC
  * content, where no IDCT rounding exists).
  */
object JpegCodec {

  import MediaCodecs.Image

  private final class Bad(msg: String) extends RuntimeException(msg, null, false, false)
  private def bad(msg: String): Nothing = throw new Bad(msg)

  /** §C.2 canonical Huffman table (mincode/maxcode/valptr) plus a 12-bit
    * lookahead LUT: codes of length ≤12 resolve in one table hit — on
    * high-entropy (noise-like) AC spectra the mass sits in 9–12-bit codes,
    * which the original 8-bit LUT sent down the bit-by-bit walk (the r11
    * close-out's "wider Huffman LUT" item); 13–16-bit codes fall back to
    * the canonical walk. Entries pack (length << 8 | value); 0 = slow path
    * (length ≥ 1 makes every real entry ≥ 256).
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    val lut = new Array[Int](1 << 12)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          if (l <= 12) {
            var c = code
            while (c <= code + bits(l - 1) - 1) {
              val base = c << (12 - l)
              var s = 0
              while (s < (1 << (12 - l))) {
                lut(base | s) = (l << 8) | vals(k + c - code)
                s += 1
              }
              c += 1
            }
          }
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      val e = lut(br.peek12())
      if (e != 0) { br.drop(e >>> 8); return e & 0xff }
      var code = 0; var l = 0
      while (l < 16) {
        code = (code << 1) | br.bit()
        l += 1
        if (maxcode(l) >= 0 && code <= maxcode(l) && code >= mincode(l))
          return vals(valptr(l) + code - mincode(l))
      }
      bad("huffman code overflow")
    }
  }

  /** Entropy-segment bit reader over a 64-bit buffer: 0xFF00 unstuffing;
    * any bare marker inside the stream ends it (truncation unless the
    * caller consumed all MCUs).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0L
    private var cnt = 0
    /** append one byte; false when the stream hits a bare marker / EOF. */
    private def fillByte(): Boolean = {
      if (pos >= b.length) return false
      val v = b(pos) & 0xff
      if (v == 0xff) {
        val m = if (pos + 1 < b.length) b(pos + 1) & 0xff else -1
        if (m != 0x00) return false
        pos += 2
      } else pos += 1
      buf = (buf << 8) | v; cnt += 8
      true
    }
    def bit(): Int = {
      if (cnt == 0 && !fillByte()) bad("entropy stream truncated")
      cnt -= 1
      ((buf >>> cnt) & 1L).toInt
    }
    def bits(n: Int): Int = {
      if (n == 0) return 0
      while (cnt < n) if (!fillByte()) bad("entropy stream truncated")
      cnt -= n
      ((buf >>> cnt) & ((1L << n) - 1)).toInt
    }
    /** next 12 bits without consuming, zero-padded at stream end. */
    def peek12(): Int = {
      while (cnt < 12 && fillByte()) {}
      if (cnt >= 12) ((buf >>> (cnt - 12)) & 0xfffL).toInt
      else ((buf << (12 - cnt)) & 0xfffL).toInt
    }
    def drop(n: Int): Unit = {
      if (n > cnt) bad("entropy stream truncated")
      cnt -= n
    }
    /** §E.2.4: byte-align, consume the expected RSTn. */
    def restart(n: Int): Unit = {
      cnt = 0; buf = 0L
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == 0xff)
        pos += 1 // fill bytes
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n))
        bad(s"expected RST$n")
      pos += 2
    }
  }

  // AAN per-frequency scale factors (Arai–Agui–Nakajima 1988): the
  // factorization pulls sqrt(2)*cos(k*pi/16) out of each 1-D stage, so the
  // butterfly itself needs only 5 multiplies — the factors fold into the
  // dequantization table (with the overall 1/8), costing nothing per block
  private val aan: Array[Double] = Array.tabulate(8) { k =>
    if (k == 0) 1.0 else math.sqrt(2.0) * math.cos(k * math.Pi / 16.0)
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0; var acTab = 0; var dcPred = 0
    var plane: Array[Int] = null // blocksW*8 x blocksH*8 samples
    var planeW = 0
  }

  def decode(b: Array[Byte]): Option[Image] =
    try Some(decodeOrThrow(b))
    catch { case _: Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeOrThrow(b: Array[Byte]): Image = {
    def u16(i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) bad("no SOI")

    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcH = new Array[Huff](4); val acH = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0

    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) bad("marker sync lost")
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      m match {
        case 0xdb => // DQT
          val len = u16(i + 2); var p = i + 4
          while (p < i + 2 + len) {
            val pq = (b(p) & 0xf0) >> 4; val tq = b(p) & 0x0f
            if (tq > 3) bad("DQT id")
            p += 1
            var k = 0
            while (k < 64) {
              qt(tq)(k) = if (pq == 0) b(p + k) & 0xff else u16(p + 2 * k)
              k += 1
            }
            p += (if (pq == 0) 64 else 128)
          }
          i += 2 + len
        case 0xc4 => // DHT
          val len = u16(i + 2); var p = i + 4
          while (p < i + 2 + len) {
            val tc = (b(p) & 0xf0) >> 4; val th = b(p) & 0x0f
            if (tc > 1 || th > 3) bad("DHT id")
            val bits = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(j => b(p + 17 + j) & 0xff)
            val h = new Huff(bits, vals)
            if (tc == 0) dcH(th) = h else acH(th) = h
            p += 17 + n
          }
          i += 2 + len
        case 0xc0 => // SOF0 baseline
          val len = u16(i + 2)
          if ((b(i + 4) & 0xff) != 8) bad("only 8-bit precision")
          height = u16(i + 5); width = u16(i + 7)
          val nc = b(i + 9) & 0xff
          if (nc != 1 && nc != 3) bad(s"$nc components")
          if (width <= 0 || height <= 0 ||
              width.toLong * height * 3 > MediaCodecs.maxPixelBytes) bad("dims")
          comps = Array.tabulate(nc) { c =>
            val o = i + 10 + 3 * c
            val comp = Component(b(o) & 0xff, (b(o + 1) & 0xf0) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 || comp.tq > 3) bad("sampling")
            comp
          }
          i += 2 + len
        case 0xc2 => bad("progressive JPEG unsupported")
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          bad(f"SOF$x%02x unsupported")
        case 0xdd => // DRI
          restartInterval = u16(i + 4); i += 2 + u16(i + 2)
        case 0xda => // SOS → entropy decode, then done
          if (comps == null) bad("SOS before SOF")
          val len = u16(i + 2)
          val ns = b(i + 4) & 0xff
          if (ns != comps.length) bad("interleave mismatch")
          var p = i + 5
          for (_ <- 0 until ns) {
            val cid = b(p) & 0xff
            val comp = comps.find(_.id == cid).getOrElse(bad("unknown scan component"))
            comp.dcTab = (b(p + 1) & 0xf0) >> 4
            comp.acTab = b(p + 1) & 0x0f
            p += 2
          }
          decodeScan(b, i + 2 + len, comps, width, height, qt, dcH, acH, restartInterval)
          return assemble(comps, width, height)
        case 0xd9 => bad("EOI before SOS")
        case 0xd8 => i += 2
        case _ => i += 2 + u16(i + 2) // APPn / COM / everything else
      }
    }
    bad("no SOS")
  }

  private def decodeScan(
      b: Array[Byte], start: Int, comps: Array[Component],
      width: Int, height: Int, qt: Array[Array[Int]],
      dcH: Array[Huff], acH: Array[Huff], ri: Int): Unit = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Int](c.planeW * mcusY * c.v * 8)
      c.dcPred = 0
    }
    val br = new BitReader(b, start)
    // dequant tables with the AAN scale factors (and the DCT's 1/8) folded
    // in, indexed in zigzag order like the raw tables; q(0)*0.125 is an
    // exact dyadic product, which keeps the DC-only fast path bit-identical
    // to the previous exact-cosine implementation
    val scaledQ: Array[Array[Double]] = Array.tabulate(4) { t =>
      Array.tabulate(64) { k =>
        val n = zigzagNatural(k)
        qt(t)(k) * aan(n >> 3) * aan(n & 7) * 0.125
      }
    }
    val blk = new Array[Double](64)
    val f = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        br.restart(rstIdx % 8); rstIdx += 1
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      for (c <- comps; by <- 0 until c.v; bx <- 0 until c.h) {
        decodeBlock(br, c, scaledQ(c.tq), dcH, acH, blk)
        idct(blk, f)
        val ox = (mx * c.h + bx) * 8
        val oy = (my * c.v + by) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val v = (f(y * 8 + x) + 128.5).toInt
            c.plane((oy + y) * c.planeW + ox + x) =
              if (v < 0) 0 else if (v > 255) 255 else v
            x += 1
          }
          y += 1
        }
      }
      mcu += 1
    }
  }

  private def decodeBlock(br: BitReader, c: Component, q: Array[Double],
      dcH: Array[Huff], acH: Array[Huff], out: Array[Double]): Unit = {
    java.util.Arrays.fill(out, 0.0)
    val dh = dcH(c.dcTab); val ah = acH(c.acTab)
    if (dh == null || ah == null) bad("missing huffman table")
    val t = dh.decode(br)
    val diff = if (t == 0) 0 else extend(br.bits(t), t)
    c.dcPred += diff
    out(0) = c.dcPred * q(0)
    var k = 1
    while (k < 64) {
      val rs = ah.decode(br)
      val r = rs >> 4; val s = rs & 0x0f
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += r
        if (k > 63) bad("AC index overflow")
        out(zigzagNatural(k)) = extend(br.bits(s), s) * q(k)
        k += 1
      }
    }
  }

  // natural-order index of zigzag position k (correct table, kept apart
  // from the unused constant above)
  private val zigzagNatural: Array[Int] = {
    val zz = new Array[Int](64)
    var k = 0
    var x = 0; var y = 0; var up = true
    while (k < 64) {
      zz(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      k += 1
    }
    zz
  }

  /** §F.2.2.1 EXTEND. */
  private def extend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 2-D IDCT via the AAN factorization (Arai–Agui–Nakajima
    * 1988; the classic float-IDCT butterfly structure), ~5 multiplies per
    * 1-D pass against the naive basis sum's 64 — the r11 close-out's
    * "fixed-point/AAN IDCT" item, kept in doubles so the result stays
    * within fp rounding of the exact transform (the factorization is exact
    * in exact arithmetic; the scale factors live in the dequant table).
    * Exact zero-skip fast paths as before: a DC-only block (dominant in
    * smooth imagery) is a constant fill — bit-identical to the previous
    * implementation because the folded DC scale is the same dyadic
    * q(0)/8 — and all-zero columns pass through as zeros.
    */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    var onlyDc = true
    var k = 1
    while (onlyDc && k < 64) { if (in(k) != 0.0) onlyDc = false; k += 1 }
    if (onlyDc) {
      java.util.Arrays.fill(out, in(0))
      return
    }
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // column pass
      if (in(8 + x) == 0.0 && in(16 + x) == 0.0 && in(24 + x) == 0.0 &&
          in(32 + x) == 0.0 && in(40 + x) == 0.0 && in(48 + x) == 0.0 &&
          in(56 + x) == 0.0) {
        // AC-free column: constant in(0+x) down the column
        val v = in(x)
        var y = 0
        while (y < 8) { tmp(y * 8 + x) = v; y += 1 }
      } else {
        aan1d(in, x, 8, tmp, x, 8)
      }
      x += 1
    }
    var y = 0
    while (y < 8) { // row pass
      aan1d(tmp, y * 8, 1, out, y * 8, 1)
      y += 1
    }
  }

  /** One 8-point AAN inverse-DCT butterfly: reads 8 values at
    * `src(srcOff + i*srcStride)`, writes 8 at `dst(dstOff + i*dstStride)`.
    * Input is expected pre-scaled by the folded aan factors.
    */
  private def aan1d(src: Array[Double], srcOff: Int, srcStride: Int,
      dst: Array[Double], dstOff: Int, dstStride: Int): Unit = {
    // even part
    val i0 = src(srcOff)
    val i2 = src(srcOff + 2 * srcStride)
    val i4 = src(srcOff + 4 * srcStride)
    val i6 = src(srcOff + 6 * srcStride)
    val t10 = i0 + i4
    val t11 = i0 - i4
    val t13 = i2 + i6
    val t12 = (i2 - i6) * 1.4142135623730951 - t13
    val e0 = t10 + t13
    val e3 = t10 - t13
    val e1 = t11 + t12
    val e2 = t11 - t12
    // odd part
    val i1 = src(srcOff + srcStride)
    val i3 = src(srcOff + 3 * srcStride)
    val i5 = src(srcOff + 5 * srcStride)
    val i7 = src(srcOff + 7 * srcStride)
    val z13 = i5 + i3
    val z10 = i5 - i3
    val z11 = i1 + i7
    val z12 = i1 - i7
    val o7 = z11 + z13
    val t11b = (z11 - z13) * 1.4142135623730951
    val z5 = (z10 + z12) * 1.8477590650225735
    val t10b = 1.0823922002923940 * z12 - z5
    val t12b = -2.6131259297527530 * z10 + z5
    val o6 = t12b - o7
    val o5 = t11b - o6
    val o4 = t10b + o5
    dst(dstOff) = e0 + o7
    dst(dstOff + 7 * dstStride) = e0 - o7
    dst(dstOff + dstStride) = e1 + o6
    dst(dstOff + 6 * dstStride) = e1 - o6
    dst(dstOff + 2 * dstStride) = e2 + o5
    dst(dstOff + 5 * dstStride) = e2 - o5
    dst(dstOff + 3 * dstStride) = e3 - o4
    dst(dstOff + 4 * dstStride) = e3 + o4
  }

  private def assemble(comps: Array[Component], width: Int, height: Int): Image = {
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = c.plane(y * c.planeW + x).toByte
          x += 1
        }
        y += 1
      }
      Image(width, height, 1, out)
    } else {
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val out = new Array[Byte](width * height * 3)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * pr)
          out(o + 1) = clamp(yy - 0.344136 * pb - 0.714136 * pr)
          out(o + 2) = clamp(yy + 1.772 * pb)
          x += 1
        }
        y += 1
      }
      Image(width, height, 3, out)
    }
  }

  private def clamp(v: Double): Byte = {
    val i = (v + 0.5).toInt
    (if (i < 0) 0 else if (i > 255) 255 else i).toByte
  }
}
