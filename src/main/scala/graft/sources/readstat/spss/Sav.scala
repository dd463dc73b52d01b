package graft.sources.readstat.spss

import java.io.{EOFException, InputStream}
import java.nio.charset.Charset

/** SPSS `.sav`/`.zsav` format model + dictionary parser ($FL2/$FL3,
  * compression 0/1 bytecode/2 zlib, both byte orders).
  *
  * Format knowledge derived from the public sav spec (PSPP documentation)
  * and the reference's observable behavior (`src/spss/header.rs:7-51`,
  * `src/spss/metadata.rs:142-237`, `src/spss/data.rs:1521-1761`).
  */
object Sav {

  val MissingDoubleBits = 0xFFEFFFFFFFFFFFFFL // system missing
  val LowestDoubleBits = 0xFFEFFFFFFFFFFFFEL
  val HighestDoubleBits = 0x7FEFFFFFFFFFFFFFL
  val SecShift = 12219379200L // seconds 1582-10-14 → 1970-01-01

  final case class ByteReader(in: InputStream) {
    private var pos0 = 0L
    def pos: Long = pos0
    def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException(s"sav: unexpected EOF at $pos0")
        off += r
      }
      pos0 += n
      buf
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) { readFully(left.toInt); left = 0 } // readFully advances pos0
        else { left -= s; pos0 += s }
      }
    }
  }

  object Bin {
    def i32(b: Array[Byte], off: Int, le: Boolean): Int =
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      else ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    def i64(b: Array[Byte], off: Int, le: Boolean): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(off + (if (le) i else 7 - i)) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def f64(b: Array[Byte], off: Int, le: Boolean): Double =
      java.lang.Double.longBitsToDouble(i64(b, off, le))
  }

  final case class Header(
      zsav: Boolean,
      littleEndian: Boolean,
      compression: Int,
      nominalCaseSize: Int,
      rowCount: Long, // -1 = unknown
      bias: Double)

  final case class Variable(
      var name: String,
      shortName: String,
      isString: Boolean,
      var widthSegments: Int, // number of 8-byte units incl continuations
      var stringLen: Int,
      formatType: Int,
      offsetSegments: Int,    // segment index within the record
      missingRange: Boolean,
      missingDoubles: Array[Double],
      var missingStrings: Array[String],
      var valueLabelSet: Option[String])

  final case class Metadata(
      header: Header,
      variables: Array[Variable],
      // label set name → (numeric-bits → label, string → label)
      valueLabels: Map[String, (Map[Long, String], Map[String, String])],
      dataOffset: Long,
      charsetName: String) {
    def recordSegments: Int = variables.map(_.widthSegments).sum
    def recordLen: Int = recordSegments * 8
    def charset: Charset = Charset.forName(charsetName)
  }

  sealed trait FormatClass
  case object FDate extends FormatClass
  case object FTime extends FormatClass
  case object FDateTime extends FormatClass

  def formatClass(code: Int): Option[FormatClass] = code match {
    case 20 | 23 | 24 | 38 | 39 => Some(FDate)
    case 21 | 25 => Some(FTime)
    case 22 | 41 => Some(FDateTime)
    case _ => None
  }

  /** SPSS integer-info character code → Java charset; full parity with the
    * reference's codepage table (`src/spss/metadata.rs:559-612`), extended
    * with the JDK's real IBMxxx OEM charsets where encoding_rs has none.
    * Unknown codes return None → the prevailing/default encoding stands.
    */
  def codepageCharset(code: Int): Option[String] = {
    val candidates: Seq[String] = code match {
      case 2 | 3 | 1252 => Seq("windows-1252")
      case 65001 => Seq("UTF-8")
      case 1200 => Seq("UTF-16LE")
      case 1201 => Seq("UTF-16BE")
      case 437 => Seq("IBM437")
      case 850 => Seq("IBM850")
      case 852 => Seq("IBM852")
      case 855 => Seq("IBM855")
      case 857 => Seq("IBM857")
      case 858 => Seq("IBM00858")
      case 860 => Seq("IBM860")
      case 861 => Seq("IBM861")
      case 862 => Seq("IBM862")
      case 863 => Seq("IBM863")
      case 864 => Seq("IBM864")
      case 865 => Seq("IBM865")
      case 866 => Seq("IBM866")
      case 869 => Seq("IBM869")
      case 874 => Seq("x-windows-874", "TIS-620")
      case 932 => Seq("windows-31j", "Shift_JIS")
      case 936 | 51936 => Seq("GBK")
      case 949 | 51949 => Seq("EUC-KR")
      case 950 => Seq("x-windows-950", "Big5")
      case 1250 => Seq("windows-1250")
      case 1251 => Seq("windows-1251")
      case 1253 => Seq("windows-1253")
      case 1254 => Seq("windows-1254")
      case 1255 => Seq("windows-1255")
      case 1256 => Seq("windows-1256")
      case 1257 => Seq("windows-1257")
      case 1258 => Seq("windows-1258")
      case 28591 => Seq("ISO-8859-1")
      case 28592 => Seq("ISO-8859-2")
      case 28593 => Seq("ISO-8859-3")
      case 28594 => Seq("ISO-8859-4")
      case 28595 => Seq("ISO-8859-5")
      case 28596 => Seq("ISO-8859-6")
      case 28597 => Seq("ISO-8859-7")
      case 28598 => Seq("ISO-8859-8")
      case 28599 => Seq("ISO-8859-9")
      case 28605 => Seq("ISO-8859-15")
      case 20866 => Seq("KOI8-R")
      case 21866 => Seq("KOI8-U")
      case 51932 => Seq("EUC-JP")
      case 54936 => Seq("GB18030")
      case _ => Seq.empty
    }
    candidates.find(Charset.isSupported)
  }

  def parseHeader(r: ByteReader): Header = {
    val buf = r.readFully(176)
    val magic = new String(buf, 0, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(magic == "$FL2" || magic == "$FL3", s"not a sav file (magic $magic)")
    val layoutLe = Bin.i32(buf, 64, le = true)
    val le =
      if (layoutLe == 2 || layoutLe == 3) true
      else {
        val layoutBe = Bin.i32(buf, 64, le = false)
        require(layoutBe == 2 || layoutBe == 3, "unknown sav layout code")
        false
      }
    Header(
      zsav = magic == "$FL3",
      littleEndian = le,
      compression = Bin.i32(buf, 72, le),
      nominalCaseSize = Bin.i32(buf, 68, le),
      rowCount = Bin.i32(buf, 80, le).toLong,
      bias = Bin.f64(buf, 84, le))
  }

  private def trimmed(b: Array[Byte], cs: Charset): String = {
    var end = b.length
    while (end > 0 && (b(end - 1) == 0 || b(end - 1) == ' ')) end -= 1
    new String(b, 0, end, cs).trim
  }

  /** Parse the dictionary. Strings are decoded with the encoding found in the
    * record stream; like the reference we pre-scan for the encoding record
    * first so late records don't leave earlier metadata mis-decoded
    * (`src/spss/metadata.rs:37-128`).
    */
  def parseMetadata(openStream: () => InputStream): Metadata = {
    // pass 1: find encoding
    val csName = {
      val in = openStream()
      try prescanEncoding(in).getOrElse("windows-1252")
      finally in.close()
    }
    val in = openStream()
    try parseWithCharset(ByteReader(in), Charset.forName(csName), csName)
    finally in.close()
  }

  private def prescanEncoding(in: InputStream): Option[String] = {
    val r = ByteReader(in)
    val h = parseHeader(r)
    val le = h.littleEndian
    var fallback: Option[String] = None
    try {
      while (true) {
        val rec = Bin.i32(r.readFully(4), 0, le)
        rec match {
          case 2 =>
            val buf = r.readFully(28)
            val hasLabel = Bin.i32(buf, 4, le)
            val nMissing = Bin.i32(buf, 8, le)
            if (hasLabel != 0) {
              val len = Bin.i32(r.readFully(4), 0, le)
              r.readFully(((len + 3) / 4) * 4)
            }
            if (nMissing != 0) r.readFully(math.abs(nMissing) * 8)
          case 3 =>
            val count = Bin.i32(r.readFully(4), 0, le)
            (0 until count).foreach { _ =>
              r.readFully(8)
              val vlen = r.readFully(1)(0) & 0xff
              r.readFully(((vlen + 8) / 8) * 8 - 1)
            }
            Bin.i32(r.readFully(4), 0, le) // rec 4
            val varCount = Bin.i32(r.readFully(4), 0, le)
            r.readFully(varCount * 4)
          case 4 =>
            val varCount = Bin.i32(r.readFully(4), 0, le)
            r.readFully(varCount * 4)
          case 6 =>
            val lines = Bin.i32(r.readFully(4), 0, le)
            r.readFully(lines * 80)
          case 7 =>
            val subtype = Bin.i32(r.readFully(4), 0, le)
            val size = Bin.i32(r.readFully(4), 0, le)
            val count = Bin.i32(r.readFully(4), 0, le)
            val dataLen = size * count
            if (subtype == 20 && dataLen > 0) {
              val buf = r.readFully(dataLen)
              val label = new String(buf, java.nio.charset.StandardCharsets.US_ASCII).trim
              val norm = normalizeCharsetLabel(label)
              if (norm.isDefined) return norm
            } else if (subtype == 3 && dataLen >= 32) {
              val buf = r.readFully(dataLen)
              val code = Bin.i32(buf, 28, le)
              if (code > 0) codepageCharset(code).foreach(c => fallback = Some(c))
            } else r.readFully(dataLen)
          case _ => return fallback
        }
      }
      fallback
    } catch { case _: EOFException => fallback }
  }

  def normalizeCharsetLabel(label: String): Option[String] = {
    val l = label.trim
    if (l.isEmpty) None
    else try Some(Charset.forName(l).name)
    catch {
      case _: Exception => l.toUpperCase match {
        case "CP1252" | "WINDOWS-1252" => Some("windows-1252")
        case _ => None
      }
    }
  }

  private def parseWithCharset(r: ByteReader, cs: Charset, csName: String): Metadata = {
    val h = parseHeader(r)
    val le = h.littleEndian
    val vars = scala.collection.mutable.ArrayBuffer[Variable]()
    val labelSets = scala.collection.mutable.Map[String, (Map[Long, String], Map[String, String])]()
    var labelSetIdx = 0
    var currentOffset = 0
    var dataOffset = -1L

    var done = false
    while (!done) {
      val rec = Bin.i32(r.readFully(4), 0, le)
      rec match {
        case 2 => // variable record
          val buf = r.readFully(28)
          val typ = Bin.i32(buf, 0, le)
          val hasLabel = Bin.i32(buf, 4, le)
          val nMissing = Bin.i32(buf, 8, le)
          val printFmt = Bin.i32(buf, 12, le)
          val name = trimmed(java.util.Arrays.copyOfRange(buf, 20, 28), cs).toUpperCase
          if (typ < 0) {
            // continuation of previous string variable
            if (vars.nonEmpty) vars.last.widthSegments += 1
            currentOffset += 1
          } else {
            if (hasLabel != 0) {
              val len = Bin.i32(r.readFully(4), 0, le)
              r.readFully(((len + 3) / 4) * 4)
            }
            var missingRange = false
            val missD = scala.collection.mutable.ArrayBuffer[Double]()
            val missS = scala.collection.mutable.ArrayBuffer[String]()
            if (nMissing != 0) {
              val n = math.abs(nMissing)
              if (nMissing < 0) missingRange = true
              (0 until n).foreach { _ =>
                val raw = r.readFully(8)
                if (typ == 0) missD += Bin.f64(raw, 0, le)
                else missS += trimmed(raw, cs)
              }
            }
            val fmtType = (printFmt >>> 16) & 0xff
            vars += Variable(
              name = name, shortName = name,
              isString = typ > 0,
              widthSegments = 1,
              stringLen = if (typ > 0) typ else 0,
              formatType = fmtType,
              offsetSegments = currentOffset,
              missingRange = missingRange,
              missingDoubles = missD.toArray,
              missingStrings = missS.toArray,
              valueLabelSet = None)
            currentOffset += 1
          }
        case 3 => // value labels + following rec 4 with variable offsets
          val count = Bin.i32(r.readFully(4), 0, le)
          val raws = new Array[Array[Byte]](count)
          val labels = new Array[String](count)
          var i = 0
          while (i < count) {
            raws(i) = r.readFully(8)
            val vlen = r.readFully(1)(0) & 0xff
            val padded = ((vlen + 8) / 8) * 8 - 1
            val lb = r.readFully(padded)
            labels(i) = trimmed(java.util.Arrays.copyOf(lb, math.min(vlen, lb.length)), cs)
            i += 1
          }
          val rec4 = Bin.i32(r.readFully(4), 0, le)
          require(rec4 == 4, "sav: value label record not followed by rec 4")
          val varCount = Bin.i32(r.readFully(4), 0, le)
          val offs = (0 until varCount).map(_ => Bin.i32(r.readFully(4), 0, le))
          val isString = offs.exists { off =>
            vars.exists(v => v.offsetSegments == off - 1 && v.isString)
          }
          val numMap = scala.collection.mutable.Map[Long, String]()
          val strMap = scala.collection.mutable.Map[String, String]()
          (0 until count).foreach { i =>
            if (labels(i).nonEmpty) {
              if (isString) strMap(trimmed(raws(i), cs)) = labels(i)
              else numMap(Bin.i64(raws(i), 0, le)) = labels(i)
            }
          }
          val setName = s"labels$labelSetIdx"
          labelSetIdx += 1
          labelSets(setName) = (numMap.toMap, strMap.toMap)
          offs.foreach { off =>
            vars.find(_.offsetSegments == off - 1).foreach(_.valueLabelSet = Some(setName))
          }
        case 4 =>
          val varCount = Bin.i32(r.readFully(4), 0, le)
          r.readFully(varCount * 4)
        case 6 =>
          val lines = Bin.i32(r.readFully(4), 0, le)
          r.readFully(lines * 80)
        case 7 =>
          val subtype = Bin.i32(r.readFully(4), 0, le)
          val size = Bin.i32(r.readFully(4), 0, le)
          val count = Bin.i32(r.readFully(4), 0, le)
          val dataLen = size * count
          subtype match {
            case 13 if dataLen > 0 => // long variable names: short=Long\t...
              val buf = r.readFully(dataLen)
              splitTabEntries(buf).foreach { case (k, v) =>
                vars.find(_.name.equalsIgnoreCase(k)).foreach(_.name = v)
              }
            case 14 if dataLen > 0 => // very long strings: name=len\t...
              val buf = r.readFully(dataLen)
              splitTabEntries(buf).foreach { case (k, v) =>
                v.trim.toIntOption.foreach { len =>
                  vars.find(x => x.shortName.equalsIgnoreCase(k) || x.name.equalsIgnoreCase(k))
                    .foreach(_.stringLen = len)
                }
              }
            case 21 if dataLen > 0 => // long-string value labels
              val buf = r.readFully(dataLen)
              var pos = 0
              def u32At(p: Int): Int = Bin.i32(buf, p, le)
              while (pos + 4 <= buf.length) {
                val nameLen = u32At(pos); pos += 4
                val name = new String(buf, pos, nameLen, cs); pos += nameLen
                pos += 4 // declared string length
                val labelCount = u32At(pos); pos += 4
                val strMap = scala.collection.mutable.Map[String, String]()
                (0 until labelCount).foreach { _ =>
                  val vLen = u32At(pos); pos += 4
                  val value = trimmed(java.util.Arrays.copyOfRange(buf, pos, pos + vLen), cs)
                  pos += vLen
                  val lLen = u32At(pos); pos += 4
                  val label = trimmed(java.util.Arrays.copyOfRange(buf, pos, pos + lLen), cs)
                  pos += lLen
                  if (label.nonEmpty) strMap(value) = label
                }
                if (strMap.nonEmpty) {
                  val setName = s"labels$labelSetIdx"
                  labelSetIdx += 1
                  labelSets(setName) = (Map.empty, strMap.toMap)
                  vars.find(v => v.name.equalsIgnoreCase(name) || v.shortName.equalsIgnoreCase(name))
                    .foreach(_.valueLabelSet = Some(setName))
                }
              }
            case 22 if dataLen > 0 => // long-string missing values
              val buf = r.readFully(dataLen)
              var pos = 0
              def u32At(p: Int): Int = Bin.i32(buf, p, le)
              while (pos + 4 <= buf.length) {
                val nameLen = u32At(pos); pos += 4
                val name = new String(buf, pos, nameLen, cs); pos += nameLen
                val nMissing = buf(pos) & 0xff; pos += 1
                require(nMissing >= 1 && nMissing <= 3, "sav: bad long-string missing count")
                val len = u32At(pos); pos += 4
                val values = (0 until nMissing).map { _ =>
                  val s = trimmed(java.util.Arrays.copyOfRange(buf, pos, pos + len), cs)
                  pos += len
                  s
                }
                vars.find(v => v.name.equalsIgnoreCase(name) || v.shortName.equalsIgnoreCase(name))
                  .foreach(v => v.missingStrings = values.toArray)
              }
            case _ => r.readFully(dataLen)
          }
        case 999 =>
          r.readFully(4) // filler
          dataOffset = r.pos
          done = true
        case other =>
          throw new IllegalArgumentException(s"sav: unknown record type $other")
      }
    }

    // coalesce very-long-string segments (reference `src/spss/metadata.rs:234-264`)
    val out = scala.collection.mutable.ArrayBuffer[Variable]()
    var i = 0
    while (i < vars.length) {
      val v = vars(i)
      val nSeg = if (v.isString && v.stringLen > 255) (v.stringLen + 251) / 252 else 1
      if (nSeg > 1) {
        val end = math.min(i + nSeg, vars.length)
        v.widthSegments = vars.slice(i, end).map(_.widthSegments).sum
        out += v
        i = end
      } else { out += v; i += 1 }
    }

    Metadata(h, out.toArray, labelSets.toMap, dataOffset, csName)
  }

  private def splitTabEntries(buf: Array[Byte]): Seq[(String, String)] = {
    new String(buf.filter(_ != 0), java.nio.charset.StandardCharsets.UTF_8)
      .split('\t').toSeq.flatMap { e =>
        val i = e.indexOf('=')
        if (i <= 0) None else Some((e.substring(0, i).trim, e.substring(i + 1).trim))
      }
  }
}
