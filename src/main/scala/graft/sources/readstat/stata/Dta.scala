package graft.sources.readstat.stata

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.{Charset, StandardCharsets}

/** Stata `.dta` format model + parser, versions 102–119, both byte orders,
  * binary (<117) and "xmlish" (117+) layouts.
  *
  * Format knowledge derived from the public dta spec and the reference
  * implementation's observable behavior (see
  * reference `src/stata/header.rs:8-18`, `src/stata/metadata.rs:136-219`,
  * `src/stata/value.rs:19-52`). Fresh Scala implementation, Spark-first.
  */
object Dta {

  // ---- primitives -------------------------------------------------------

  final case class ByteReader(in: InputStream) {
    private var pos0 = 0L
    def pos: Long = pos0
    def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException(s"unexpected EOF at $pos0 (+$off of $n)")
        off += r
      }
      pos0 += n
      buf
    }
    /** Read up to n bytes; returns fewer at EOF. */
    def readUpTo(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      var r = 0
      while (off < n && { r = in.read(buf, off, n - off); r >= 0 }) off += r
      pos0 += off
      if (off == n) buf else java.util.Arrays.copyOf(buf, off)
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) { readFully(left.toInt); left = 0 } else left -= s
      }
      pos0 += n
    }
    def expectTag(tag: String): Unit = {
      val got = readFully(tag.length)
      if (!java.util.Arrays.equals(got, tag.getBytes(StandardCharsets.US_ASCII)))
        throw new IllegalArgumentException(
          s"dta parse: expected '$tag', got '${new String(got, StandardCharsets.US_ASCII)}' at $pos0")
    }
    def tryTag(tag: String): Boolean = {
      val got = readUpTo(tag.length)
      got.length == tag.length &&
        java.util.Arrays.equals(got, tag.getBytes(StandardCharsets.US_ASCII))
    }
  }

  object Bin {
    def u16(b: Array[Byte], off: Int, le: Boolean): Int =
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(b: Array[Byte], off: Int, le: Boolean): Long =
      if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) | ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    def i16(b: Array[Byte], off: Int, le: Boolean): Short = u16(b, off, le).toShort
    def i32(b: Array[Byte], off: Int, le: Boolean): Int = u32(b, off, le).toInt
    def u64(b: Array[Byte], off: Int, le: Boolean): Long = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val byte = b(off + (if (le) i else 7 - i)) & 0xffL
        v |= byte << (8 * i)
        i += 1
      }
      v
    }
  }

  // ---- model ------------------------------------------------------------

  sealed trait VarType { def width: Int }
  case object TByte extends VarType { val width = 1 }
  case object TInt16 extends VarType { val width = 2 }
  case object TInt32 extends VarType { val width = 4 }
  case object TFloat extends VarType { val width = 4 }
  case object TDouble extends VarType { val width = 8 }
  final case class TStr(w: Int) extends VarType { def width: Int = w }
  case object TStrL extends VarType { val width = 8 }

  final case class Header(version: Int, littleEndian: Boolean, nvars: Int, nobs: Long)

  final case class Variable(
      name: String,
      varType: VarType,
      format: Option[String],
      label: Option[String],
      valueLabelName: Option[String])

  final case class Metadata(
      header: Header,
      variables: Array[Variable],
      dataOffset: Long,
      strlsOffset: Option[Long],
      valueLabelsOffset: Option[Long],
      valueLabels: Map[String, Map[Int, String]],
      charsetName: String,
      /** O3: 1-based variable indices the data is sorted by, in order. */
      sortedBy: Seq[Int] = Seq.empty) {
    def recordLen: Int = variables.map(_.varType.width).sum
    def charset: Charset = Charset.forName(charsetName)
  }

  final case class Layout(
      xmlish: Boolean,
      typlistVersion: Int, // 0, 111, 117
      typlistEntryLen: Int,
      varNameLen: Int,
      fmtEntryLen: Int,
      lblListEntryLen: Int,
      varLabelEntryLen: Int,
      dataLabelLen: Int,
      dataLabelLenLen: Int,
      timestampLen: Int,
      srtEntryLen: Int,
      expansionLenLen: Int,
      vlTableLenLen: Int,
      vlLabnameLen: Int,
      vlPaddingLen: Int)

  def layoutFor(v: Int): Layout = {
    require(v >= 102 && v <= 119, s"unsupported Stata dta version: $v")
    val fmtEntryLen = if (v < 105) 7 else if (v < 114) 12 else if (v < 118) 49 else 57
    val typlistVersion = if (v >= 117) 117 else if (v >= 111) 111 else 0
    val (dataLabelLenLen, timestampLen) =
      if (v >= 118) (2, 18) else if (v >= 117) (1, 18) else (0, if (v < 105) 0 else 18)
    val (lblListEntryLen, varNameLen) =
      if (v < 110) (9, 9) else if (v < 118) (33, 33) else (129, 129)
    val (varLabelEntryLen, dataLabelLen) =
      if (v < 108) (32, 32) else if (v < 118) (81, 81) else (321, 321)
    val (vlTableLenLen, vlLabnameLen, vlPaddingLen) =
      if (v < 105) (2, 12, 2) else (4, if (v < 118) 33 else 129, 3)
    Layout(
      xmlish = v >= 117,
      typlistVersion = typlistVersion,
      typlistEntryLen = if (v < 117) 1 else 2,
      varNameLen = varNameLen,
      fmtEntryLen = fmtEntryLen,
      lblListEntryLen = lblListEntryLen,
      varLabelEntryLen = varLabelEntryLen,
      dataLabelLen = dataLabelLen,
      dataLabelLenLen = dataLabelLenLen,
      timestampLen = timestampLen,
      srtEntryLen = if (v < 119) 2 else 4,
      expansionLenLen = if (v < 105) 0 else if (v < 110) 2 else 4,
      vlTableLenLen = vlTableLenLen,
      vlLabnameLen = vlLabnameLen,
      vlPaddingLen = vlPaddingLen)
  }

  def defaultCharsetName(version: Int): String =
    if (version >= 118) "UTF-8" else "windows-1252"

  // ---- missing-value rules ---------------------------------------------

  final case class MissingRules(
      maxI8: Byte, maxI16: Short, maxI32: Int,
      sentinelEnabled: Boolean,
      sentI8: Byte, sentI16: Short, sentI32: Int,
      maxFloatBits: Long, maxDoubleBits: Long,
      missingFloatBits: Long, missingDoubleBits: Long)

  def missingRules(version: Int): MissingRules =
    if (version < 113)
      MissingRules(0x7e, 0x7ffe, 0x7ffffffe, sentinelEnabled = false, 0, 0, 0,
        0x7effffffL, 0x7fdfffffffffffffL, 0x7f000000L, 0x7fe0000000000000L)
    else
      MissingRules(0x7f, 0x7fff, 0x7fffffff, sentinelEnabled = true,
        0x65, 0x7fe5, 0x7fffffe5,
        0x7effffffL, 0x7fdfffffffffffffL, 0x7f000000L, 0x7fe0000000000000L)

  // ---- time formats -----------------------------------------------------

  sealed trait TimeKind
  case object KDate extends TimeKind        // %td %tw %tm %tq %th %ty → DateType
  case object KDateTime extends TimeKind    // %tc → TimestampNTZ
  final case class KTime(nullOnDatetime: Boolean) extends TimeKind // %tcHH:MM:SS → Long nanos

  /** Epoch shifts: Stata day 0 / ms 0 = 1960-01-01. */
  val EpochShiftDays = 3653L
  val EpochShiftMs: Long = EpochShiftDays * 86400000L

  def timeFormatKind(format: Option[String], vt: VarType): Option[TimeKind] = {
    val numeric = vt match {
      case TStr(_) | TStrL => false
      case _ => true
    }
    if (!numeric) return None
    val fmt = format.map(_.trim).getOrElse(return None)
    def classify(unit: Char, rest: String): Option[TimeKind] = unit match {
      case 'c' | 'C' =>
        if (rest.isEmpty) Some(KDateTime)
        else {
          val hasDateTokens = rest.exists(c => "CcYyNnDd".indexOf(c) >= 0)
          Some(KTime(nullOnDatetime = hasDateTokens))
        }
      case 'd' | 'w' | 'm' | 'q' | 'h' | 'y' => Some(KDate)
      case _ => None
    }
    if (fmt.startsWith("%t") && fmt.length >= 3) classify(fmt.charAt(2), fmt.substring(3))
    else if (fmt.startsWith("%") && fmt.length >= 2) classify(fmt.charAt(1), "")
    else None
  }

  // ---- header + metadata parse -----------------------------------------

  private val XmlTag = "<stata_dta>"

  def parseHeader(r: ByteReader): Header = {
    val probe = r.readFully(XmlTag.length)
    if (java.util.Arrays.equals(probe, XmlTag.getBytes(StandardCharsets.US_ASCII))) {
      r.expectTag("<header>")
      r.expectTag("<release>")
      val rel = new String(r.readFully(3), StandardCharsets.US_ASCII).toInt
      r.expectTag("</release>")
      r.expectTag("<byteorder>")
      val bo = new String(r.readFully(3), StandardCharsets.US_ASCII)
      val le = bo match {
        case "LSF" => true
        case "MSF" => false
        case other => throw new IllegalArgumentException(s"bad byteorder tag: $other")
      }
      r.expectTag("</byteorder>")
      r.expectTag("<K>")
      val nvars =
        if (rel >= 119) Bin.u32(r.readFully(4), 0, le).toInt else Bin.u16(r.readFully(2), 0, le)
      r.expectTag("</K>")
      r.expectTag("<N>")
      val nobs =
        if (rel >= 118) Bin.u64(r.readFully(8), 0, le) else Bin.u32(r.readFully(4), 0, le)
      r.expectTag("</N>")
      Header(rel, le, nvars, nobs)
    } else {
      // legacy binary header: already consumed 11 bytes of it
      val b = probe
      val version = b(0) & 0xff
      val le = (b(1) & 0xff) match {
        case 0x00 | 0x02 => true
        case 0x01 => false
        case x => throw new IllegalArgumentException(s"bad dta byteorder byte: $x")
      }
      require(version >= 102 && version <= 116, s"unsupported dta version byte: $version")
      // bytes: 0 version, 1 byteorder, 2 filetype, 3 unused, 4-5 nvars, 6.. nobs
      val nvars = Bin.u16(b, 4, le)
      val nobs =
        if (version == 102) Bin.u16(b, 6, le).toLong
        else {
          // need one more byte beyond the 11-byte probe for u32 nobs (6..9 in probe)
          Bin.u32(b, 6, le)
        }
      Header(version, le, nvars, nobs)
    }
  }

  private def cString(b: Array[Byte], cs: Charset): String = {
    var n = 0
    while (n < b.length && b(n) != 0) n += 1
    new String(b, 0, n, cs)
  }

  def typecodeToVarType(code: Int, typlistVersion: Int): VarType = typlistVersion match {
    case 111 => code match {
      case 0xFB => TByte
      case 0xFC => TInt16
      case 0xFD => TInt32
      case 0xFE => TFloat
      case 0xFF => TDouble
      case w => TStr(w)
    }
    case 117 => code match {
      case 0xFFFA => TByte
      case 0xFFF9 => TInt16
      case 0xFFF8 => TInt32
      case 0xFFF7 => TFloat
      case 0xFFF6 => TDouble
      case 0x8000 => TStrL
      case w => TStr(w)
    }
    case _ =>
      if (code < 0x7F) code.toChar match {
        case 'b' => TByte
        case 'i' => TInt16
        case 'l' => TInt32
        case 'f' => TFloat
        case 'd' => TDouble
        case c => throw new IllegalArgumentException(s"bad legacy dta type code: $c")
      }
      else TStr(code - 0x7F)
  }

  /** Parse everything up to (and excluding) the data section. The returned
    * metadata carries absolute offsets for data / strLs / value labels so
    * partition readers can seek directly.
    */
  def parseMetadata(r: ByteReader): Metadata = {
    val h = parseHeader(r)
    val lay = layoutFor(h.version)
    val le = h.littleEndian
    val cs = Charset.forName(defaultCharsetName(h.version))

    // data label + timestamp
    if (lay.xmlish) {
      r.expectTag("<label>")
      val labelLen =
        if (lay.dataLabelLenLen == 2) Bin.u16(r.readFully(2), 0, le)
        else r.readFully(1)(0) & 0xff
      if (labelLen > 0) r.skip(labelLen)
      r.expectTag("</label>")
      r.expectTag("<timestamp>")
      val tsLen = r.readFully(1)(0) & 0xff
      if (tsLen > 0) r.skip(tsLen)
      r.expectTag("</timestamp>")
      r.expectTag("</header>")
    } else {
      // the 11-byte xmlish probe over-read the 10-byte binary header
      // (8 bytes for v102) — those bytes belong to the data label
      val overRead = 11 - (if (h.version == 102) 8 else 10)
      if (lay.dataLabelLen > 0) r.skip(lay.dataLabelLen - overRead)
      if (lay.timestampLen > 0) r.skip(lay.timestampLen)
    }

    // map (xmlish)
    var dataOffset = -1L
    var strlsOffset: Option[Long] = None
    var vlOffset: Option[Long] = None
    if (lay.xmlish) {
      r.expectTag("<map>")
      val m = r.readFully(14 * 8)
      r.expectTag("</map>")
      dataOffset = Bin.u64(m, 9 * 8, le)
      strlsOffset = Some(Bin.u64(m, 10 * 8, le))
      vlOffset = Some(Bin.u64(m, 11 * 8, le))
    }

    def chunk(startTag: String, size: Int, endTag: String): Array[Byte] = {
      if (lay.xmlish) r.expectTag(startTag)
      val b = r.readFully(size)
      if (lay.xmlish) r.expectTag(endTag)
      b
    }

    val n = h.nvars
    val typBuf = chunk("<variable_types>", n * lay.typlistEntryLen, "</variable_types>")
    val typlist = (0 until n).map { i =>
      if (lay.typlistEntryLen == 1) typBuf(i) & 0xff else Bin.u16(typBuf, i * 2, le)
    }
    val nameBuf = chunk("<varnames>", n * lay.varNameLen, "</varnames>")
    val names = (0 until n).map(i =>
      cString(java.util.Arrays.copyOfRange(nameBuf, i * lay.varNameLen, (i + 1) * lay.varNameLen), cs))
    // sortlist: zero-terminated 1-based variable indices (O3 sort order)
    val srtBuf = chunk("<sortlist>", (n + 1) * lay.srtEntryLen, "</sortlist>")
    val sortedBy = (0 to n).iterator.map { i =>
      if (lay.srtEntryLen == 4) Bin.u32(srtBuf, i * 4, le).toInt
      else Bin.u16(srtBuf, i * 2, le)
    }.takeWhile(v => v > 0 && v <= n).toSeq
    val fmtBuf = chunk("<formats>", n * lay.fmtEntryLen, "</formats>")
    val formats = (0 until n).map(i =>
      cString(java.util.Arrays.copyOfRange(fmtBuf, i * lay.fmtEntryLen, (i + 1) * lay.fmtEntryLen), cs))
    val lblBuf = chunk("<value_label_names>", n * lay.lblListEntryLen, "</value_label_names>")
    val vlNames = (0 until n).map(i =>
      cString(java.util.Arrays.copyOfRange(lblBuf, i * lay.lblListEntryLen, (i + 1) * lay.lblListEntryLen), cs))
    val varLabBuf = chunk("<variable_labels>", n * lay.varLabelEntryLen, "</variable_labels>")
    val varLabels = (0 until n).map(i =>
      cString(java.util.Arrays.copyOfRange(varLabBuf, i * lay.varLabelEntryLen, (i + 1) * lay.varLabelEntryLen), cs))

    // expansion fields (binary layouts) → dataOffset
    if (!lay.xmlish) {
      if (lay.expansionLenLen == 0) dataOffset = r.pos
      else {
        var done = false
        while (!done) {
          val dt = r.readFully(1)(0) & 0xff
          val len =
            if (lay.expansionLenLen == 2) Bin.u16(r.readFully(2), 0, le).toLong
            else Bin.u32(r.readFully(4), 0, le)
          if (dt == 0 && len == 0) done = true
          else if (dt != 1 || len > (1L << 20))
            throw new IllegalArgumentException("invalid dta expansion field")
          else r.skip(len)
        }
        dataOffset = r.pos
      }
    }

    val variables = (0 until n).map { i =>
      val vt = typecodeToVarType(typlist(i), lay.typlistVersion)
      Variable(
        name = names(i),
        varType = vt,
        format = Some(formats(i)).filter(_.nonEmpty),
        label = Some(varLabels(i)).filter(_.nonEmpty),
        valueLabelName = Some(vlNames(i)).filter(_.nonEmpty))
    }.toArray

    val recordLen = variables.map(_.varType.width).sum.toLong
    val vlOff = vlOffset.orElse(Some(dataOffset + recordLen * h.nobs))

    Metadata(h, variables, dataOffset, strlsOffset, vlOff,
      valueLabels = Map.empty, charsetName = defaultCharsetName(h.version),
      sortedBy = sortedBy)
  }

  /** Parse value-label tables at metadata.valueLabelsOffset (re-seeked input). */
  def parseValueLabels(r: ByteReader, meta: Metadata): Map[String, Map[Int, String]] = {
    val h = meta.header
    val lay = layoutFor(h.version)
    val le = h.littleEndian
    val cs = meta.charset
    val rules = missingRules(h.version)
    if (lay.xmlish && !r.tryTag("<value_labels>")) return Map.empty

    val out = scala.collection.mutable.Map[String, Map[Int, String]]()
    var done = false
    while (!done) {
      if (lay.vlTableLenLen == 2) {
        val lenB = r.readUpTo(2)
        if (lenB.length < 2) done = true
        else {
          val len = Bin.u16(lenB, 0, le)
          val nameB = r.readUpTo(lay.vlLabnameLen)
          if (nameB.length < lay.vlLabnameLen) done = true
          else {
            val labname = cString(nameB, cs)
            r.skip(lay.vlPaddingLen)
            val table = r.readUpTo(len)
            if (table.length < len) done = true
            else {
              val nLabels = len / 8
              val mapping = (0 until nLabels).flatMap { i =>
                val lbl = cString(java.util.Arrays.copyOfRange(table, 8 * i, 8 * i + 8), cs)
                if (lbl.nonEmpty) Some(i -> lbl) else None
              }.toMap
              out(labname) = mapping
            }
          }
        }
      } else {
        if (lay.xmlish && !r.tryTag("<lbl>")) { done = true }
        else {
          val lenB = r.readUpTo(4)
          if (lenB.length < 4) done = true
          else {
            val len = Bin.u32(lenB, 0, le).toInt
            val nameB = r.readUpTo(lay.vlLabnameLen)
            if (nameB.length < lay.vlLabnameLen) done = true
            else {
              val labname = cString(nameB, cs)
              r.skip(lay.vlPaddingLen)
              val table = r.readUpTo(len)
              if (table.length < len) done = true
              else if (len >= 8) {
                if (lay.xmlish) r.expectTag("</lbl>")
                val nLab = Bin.u32(table, 0, le).toInt
                val txtlen = Bin.u32(table, 4, le).toInt
                if (txtlen <= len - 8 && nLab <= (len - 8 - txtlen) / 8) {
                  val offs = (0 until nLab).map(i => Bin.u32(table, 8 + 4 * i, le).toInt)
                  val valsBase = 8 + 4 * nLab
                  val txtBase = 8 + 8 * nLab
                  val mapping = (0 until nLab).flatMap { i =>
                    val off = offs(i)
                    if (off >= txtlen) None
                    else {
                      val lbl = cString(
                        java.util.Arrays.copyOfRange(table, txtBase + off, txtBase + txtlen), cs)
                      if (lbl.isEmpty) None
                      else {
                        val raw = Bin.i32(table, valsBase + 4 * i, le)
                        val key =
                          if (rules.sentinelEnabled && raw >= rules.sentI32) None
                          else if (raw > rules.maxI32) None
                          else Some(raw)
                        key.map(_ -> lbl)
                      }
                    }
                  }.toMap
                  out(labname) = mapping
                } else done = true
              }
            }
          }
        }
      }
    }
    out.toMap
  }

  /** Load the strL (GSO) table; xmlish formats only.
    *
    * The whole table is parsed on the driver and shipped to executors as a
    * broadcast lookup (J1), so an unbounded GSO section would pressure the
    * driver heap with no diagnostic — `maxBytes` caps the loaded content
    * bytes and fails with a named, size-reporting error instead (SURVEY
    * §7.4 risk 4).
    */
  def parseStrls(r: ByteReader, meta: Metadata,
      maxBytes: Long = Long.MaxValue): Map[(Int, Long), String] = {
    val h = meta.header
    if (h.version < 117) return Map.empty
    val le = h.littleEndian
    val cs = meta.charset
    r.expectTag("<strls>")
    val out = scala.collection.mutable.Map[(Int, Long), String]()
    var loaded = 0L
    var done = false
    while (!done) {
      val tag = r.readFully(3)
      if (java.util.Arrays.equals(tag, "GSO".getBytes(StandardCharsets.US_ASCII))) {
        var v = Bin.u32(r.readFully(4), 0, le)
        var o =
          if (h.version >= 118) Bin.u64(r.readFully(8), 0, le)
          else Bin.u32(r.readFully(4), 0, le)
        if (h.version >= 118) { v &= 0xFFFFL; o &= 0x0000FFFFFFFFFFFFL }
        val typ = r.readFully(1)(0) & 0xff
        val len = Bin.i32(r.readFully(4), 0, le)
        require(len >= 0, "negative strL length")
        if (typ == 0x82) {
          loaded += len
          if (loaded > maxBytes)
            throw new IllegalStateException(
              s"dta: strL (GSO) table exceeds maxStrlBytes=$maxBytes " +
                s"($loaded bytes across ${out.size + 1} entries so far) — the " +
                "table is driver-parsed and broadcast to every executor; " +
                "raise .option(\"maxStrlBytes\", <bytes>) if this is intended")
          val data = r.readFully(len)
          var s = new String(data, cs)
          while (s.nonEmpty && s.charAt(s.length - 1) == '\u0000') s = s.substring(0, s.length - 1)
          out((v.toInt, o)) = s
        } else r.skip(len)
      } else if (java.util.Arrays.equals(tag, "</s".getBytes(StandardCharsets.US_ASCII))) {
        r.expectTag("trls>")
        done = true
      } else throw new IllegalArgumentException("invalid strls tag")
    }
    out.toMap
  }

  /** Decode a strL (v,o) reference from a data cell.
    * v118+: v = 2 bytes, o = 6 bytes; earlier xmlish: two u32s.
    */
  def decodeStrlRef(b: Array[Byte], off: Int, le: Boolean, version: Int): (Int, Long) = {
    if (version >= 119) {
      // dta 119 widens v to 3 bytes (>32,767 vars) leaving 5 for o; stored
      // little-endian regardless of file byte order
      val v = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
      var o = 0L
      var i = 0
      while (i < 5) { o |= (b(off + 3 + i) & 0xffL) << (8 * i); i += 1 }
      (v, o)
    } else if (version == 118) {
      val v =
        if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
        else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      var o = 0L
      var i = 0
      while (i < 6) {
        val byte = b(off + 2 + (if (le) i else 5 - i)) & 0xffL
        o |= byte << (8 * i)
        i += 1
      }
      (v, o)
    } else {
      (Bin.u32(b, off, le).toInt, Bin.u32(b, off + 4, le))
    }
  }
}
