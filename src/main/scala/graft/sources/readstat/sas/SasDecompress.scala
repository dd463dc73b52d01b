package graft.sources.readstat.sas

/** SAS row decompressors: RLE (SASYZCRL) and RDC (SASYZCR2).
  *
  * Pure byte automatons; semantics match the readstat-documented command
  * sets (reference `src/sas/decompressor/rle.rs`, `rdc.rs`). Both are
  * per-row and stateless across rows, but rows are only addressable
  * sequentially within a file → compressed files plan a single partition.
  */
object SasDecompress {

  /** RLE: control nibble = command, low nibble = count modifier. */
  def rle(input: Array[Byte], inOff: Int, inLen: Int, expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outLen = 0
    var p = inOff
    val end = inOff + inLen

    def copy(count: Int): Unit = {
      val n = math.min(count, math.min(end - p, expected - outLen))
      if (n > 0) {
        System.arraycopy(input, p, out, outLen, n)
        p += n
        outLen += n
      }
    }
    def fill(count: Int, v: Byte): Unit = {
      val n = math.min(count, expected - outLen)
      if (n > 0) {
        java.util.Arrays.fill(out, outLen, outLen + n, v)
        outLen += n
      }
    }

    var break = false
    while (!break && p < end && outLen < expected) {
      val ctrl = input(p) & 0xff
      p += 1
      val cmd = (ctrl >> 4) & 0x0f
      val lo = ctrl & 0x0f
      cmd match {
        case 0x00 => // COPY64: ((lo<<8)+next+64)
          if (p >= end) break = true
          else { val nb = input(p) & 0xff; p += 1; copy((lo << 8) + nb + 64) }
        case 0x01 => // COPY64_PLUS_4096
          if (p >= end) break = true
          else { val nb = input(p) & 0xff; p += 1; copy(64 + lo * 256 + nb + 4096) }
        case 0x02 => copy(lo + 96)
        case 0x04 => // INSERT_BYTE18
          if (p + 1 >= end) break = true
          else {
            val nb = input(p) & 0xff; val b = input(p + 1); p += 2
            fill((lo << 4) + nb + 18, b)
          }
        case 0x05 => // INSERT_AT17
          if (p >= end) break = true
          else { val nb = input(p) & 0xff; p += 1; fill((lo << 8) + nb + 17, '@'.toByte) }
        case 0x06 => // INSERT_BLANK17
          if (p >= end) break = true
          else { val nb = input(p) & 0xff; p += 1; fill((lo << 8) + nb + 17, ' '.toByte) }
        case 0x07 => // INSERT_ZERO17
          if (p >= end) break = true
          else { val nb = input(p) & 0xff; p += 1; fill((lo << 8) + nb + 17, 0.toByte) }
        case 0x08 => copy(lo + 1)
        case 0x09 => copy(lo + 17)
        case 0x0A => copy(lo + 33)
        case 0x0B => copy(lo + 49)
        case 0x0C => // INSERT_BYTE3
          if (p >= end) break = true
          else { val b = input(p); p += 1; fill(lo + 3, b) }
        case 0x0D => fill(lo + 2, '@'.toByte)
        case 0x0E => fill(lo + 2, ' '.toByte)
        case 0x0F => fill(lo + 2, 0.toByte)
        case other => throw new IllegalArgumentException(s"bad RLE command $other")
      }
    }
    out // zero-padded to expected by construction
  }

  /** RDC: 16-bit control words; set bit = command, clear = literal. */
  def rdc(input: Array[Byte], inOff: Int, inLen: Int, expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    var p = inOff
    val end = inOff + inLen
    var ctrlBits = 0
    var ctrlMask = 0

    def copyPattern(offset: Int, count: Int): Unit = {
      require(outPos >= offset, s"RDC: bad back-reference offset $offset at $outPos")
      val src = outPos - offset
      val n = math.min(count, expected - outPos)
      var i = 0
      while (i < n) {
        out(outPos + i) = out(src + (i % offset))
        i += 1
      }
      outPos += n
    }

    var break = false
    while (!break && p < end && outPos < expected) {
      if (ctrlMask == 0) {
        if (p + 1 >= end) break = true
        else {
          ctrlBits = ((input(p) & 0xff) << 8) | (input(p + 1) & 0xff)
          p += 2
          ctrlMask = 0x8000
        }
      }
      if (!break) {
        if ((ctrlBits & ctrlMask) == 0) {
          if (p >= end) break = true
          else {
            out(outPos) = input(p)
            p += 1
            outPos += 1
          }
        } else {
          if (p >= end) break = true
          else {
            val cb = input(p) & 0xff
            p += 1
            val cmd = (cb >> 4) & 0x0f
            val cnt = cb & 0x0f
            cmd match {
              case 0 => // short RLE
                if (p >= end) break = true
                else {
                  val b = input(p); p += 1
                  val n = math.min(cnt + 3, expected - outPos)
                  java.util.Arrays.fill(out, outPos, outPos + n, b)
                  outPos += n
                }
              case 1 => // long RLE
                if (p + 1 >= end) break = true
                else {
                  val extra = input(p) & 0xff; val b = input(p + 1); p += 2
                  val n = math.min(cnt + (extra << 4) + 19, expected - outPos)
                  java.util.Arrays.fill(out, outPos, outPos + n, b)
                  outPos += n
                }
              case 2 => // long pattern
                if (p + 1 >= end) break = true
                else {
                  val extra = input(p) & 0xff; val countByte = input(p + 1) & 0xff; p += 2
                  copyPattern(cnt + 3 + (extra << 4), countByte + 16)
                }
              case c if c >= 3 => // short pattern: length = cmd
                if (p >= end) break = true
                else {
                  val extra = input(p) & 0xff; p += 1
                  copyPattern(cnt + 3 + (extra << 4), c)
                }
              case other => throw new IllegalArgumentException(s"bad RDC command $other")
            }
          }
        }
        ctrlMask >>= 1
      }
    }
    out
  }
}
