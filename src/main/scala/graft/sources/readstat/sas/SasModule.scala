package graft.sources.readstat.sas

import java.io.BufferedInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.readstat.{ReadstatFormats, ReadstatIO, ReadstatInputPartition, ReadstatOptions}

/** SAS `.sas7bdat` format module (SURVEY.md §2.1 S1).
  *
  * Partitioning (reference §3.3/§4.2): uncompressed files use the analytic
  * page index — every full DATA page carries the same number of rows, so a
  * row range maps to a page range with one seek. The planner validates the
  * assumption against the first DATA page's block count and falls back to a
  * single sequential partition when it doesn't hold (MIX-heavy or unusual
  * layouts). RLE/RDC-compressed files are sequential by construction →
  * single partition per file; multi-file loads restore parallelism.
  */
object SasModule extends ReadstatFormats.FormatModule {
  import Sas._

  /** `analyticRpp`: driver-validated actual rows per DATA page — present
    * only when the DATA pages from `firstDataPage` on are regular, in which
    * case a reader may seek instead of scanning sequentially. Derived from
    * the first DATA page's block count (NOT the page-capacity formula — real
    * SAS files reserve page space and pack fewer rows than fit).
    */
  final case class SasContext(meta: Metadata, analyticRpp: Option[Long])
    extends ReadstatFormats.FileContext

  /** Metadata parse walks every page (AMD metadata can trail the data, same
    * as the reference `src/sas/metadata.rs:38-88`) — ~1 GB of driver IO for
    * a 1 GB file. One planning pass calls this ~5× (schema, ranges, context,
    * natural schema), so cache per (path, size, mtime); entries are a few KB.
    */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Metadata]()

  private def parseMeta(path: String): Metadata = {
    val key = try {
      val st = ReadstatIO.status(path)
      (path, st.getLen, st.getModificationTime)
    } catch { case _: Exception => (path, -1L, -1L) }
    if (metaCache.size > 4096) metaCache.clear()
    metaCache.computeIfAbsent(key, _ => {
      val in = new BufferedInputStream(ReadstatIO.open(path), 1 << 20)
      try Sas.parseMetadata(in)
      finally in.close()
    })
  }

  def sparkField(c: Column): StructField = {
    val mb = new MetadataBuilder()
    if (c.format.nonEmpty) mb.putString("format", c.format)
    if (c.label.nonEmpty) mb.putString("label", c.label)
    val dt: DataType = kindFor(c) match {
      case KChar => StringType
      case KDate => DateType
      case KDateTime => TimestampNTZType
      case KTime => mb.putString("logical_type", "time"); LongType
      case KNumeric => DoubleType
    }
    StructField(c.name, dt, nullable = true, metadata = mb.build())
  }

  import graft.sources.readstat.InformativeNulls
  import graft.sources.readstat.InformativeNulls._

  def fieldsWithRoles(meta: Metadata, opts: ReadstatOptions): Seq[(StructField, Role, Column)] = {
    val mode = opts.inMode
    meta.columns.toSeq.flatMap { c =>
      val f = sparkField(c)
      val elig = !c.isChar && opts.inTracked(c.name)
      if (elig && mode.contains(Merged) && kindFor(c) != KNumeric)
        throw new IllegalArgumentException(
          s"informativeNulls=merged is not supported for date/time column '${c.name}'")
      InformativeNulls.expand(f, elig, mode, opts.informativeNullSuffix)
        .map { case (fld, role) => (fld, role, c) }
    }
  }

  override def schema(path: String, opts: ReadstatOptions): StructType =
    StructType(fieldsWithRoles(parseMeta(path), opts).map(_._1))

  /** Validates the analytic page index and returns the ACTUAL rows per
    * DATA page: firstDataPage onward must be DATA pages carrying the same
    * block count (taken from the first one; real SAS files pack fewer rows
    * than the page-capacity formula suggests). A MIX-page prefix is fine —
    * its rows become a sequential partition and DATA partitions seek past
    * it (reference `data_reader_at_row` `src/sas/reader.rs:364-435`).
    * Probes first, middle, and last DATA pages (3 seeks on the driver).
    */
  private def analyticRppOf(path: String, meta: Metadata): Option[Long] = {
    if (meta.compression != CNone || meta.rowLength <= 0) return None
    val dataRows = meta.rowCount - meta.mixDataRows
    if (dataRows <= 0) return None
    val h = meta.header
    val fsin = ReadstatIO.open(path)
    try {
      def pageHead(idx: Long): Option[(Int, Long)] = {
        fsin.seek(h.headerLength.toLong + idx * h.pageLength)
        val head = new Array[Byte](h.bitOffset + 8)
        if (!readFully(fsin, head, head.length)) None
        else Some((Bin.u16(head, h.bitOffset, h.littleEndian),
          Bin.u16(head, h.bitOffset + 2, h.littleEndian).toLong))
      }
      val (pt0, rpp) = pageHead(meta.firstDataPage).getOrElse(return None)
      if (pt0 != PData || rpp <= 0) return None
      val nDataPages = (dataRows + rpp - 1) / rpp
      def regular(idx: Long): Boolean = idx <= meta.firstDataPage || {
        pageHead(idx) match {
          case Some((pt, bc)) =>
            val expect =
              if (idx == meta.firstDataPage + nDataPages - 1)
                dataRows - (nDataPages - 1) * rpp
              else rpp
            pt == PData && bc == expect
          case None => false
        }
      }
      val mid = meta.firstDataPage + nDataPages / 2
      val last = meta.firstDataPage + nDataPages - 1
      if (regular(mid) && regular(last)) Some(rpp) else None
    } finally fsin.close()
  }

  override def partitionRanges(path: String, opts: ReadstatOptions): Seq[(Long, Long)] = {
    val meta = parseMeta(path)
    // zero-variable (metadata-only) files have no row storage to iterate
    val n = if (meta.rowLength <= 0) 0L else meta.rowCount
    if (n <= 0) return Seq((0L, 0L))
    analyticRppOf(path, meta) match {
      case None => Seq((0L, n))
      case Some(rpp) =>
        val pagesPerPart = math.max(1L,
          opts.maxPartitionBytes / math.max(1, meta.header.pageLength))
        val rowsPerPart = math.max(opts.minRowsPerPartition, pagesPerPart * rpp)
        // align partition starts to page boundaries for clean seeks
        val aligned = (rowsPerPart / rpp) * rpp
        val step = math.max(rpp, aligned)
        // MIX prefix rows scan sequentially as partition 0; DATA partitions
        // start at page-aligned offsets past the prefix and seek directly
        val mix = math.min(meta.mixDataRows, n)
        val prefix = if (mix > 0) Seq((0L, mix)) else Seq.empty
        prefix ++ (mix until n by step).map(s => (s, math.min(step, n - s)))
    }
  }

  override def fileContext(path: String, opts: ReadstatOptions): ReadstatFormats.FileContext = {
    val meta = parseMeta(path)
    SasContext(meta, analyticRppOf(path, meta))
  }

  override def reader(
      part: ReadstatInputPartition,
      ctx: ReadstatFormats.FileContext,
      required: StructType,
      opts: ReadstatOptions,
      filters: Seq[org.apache.spark.sql.sources.Filter]): PartitionReader[InternalRow] = {
    val c = ctx.asInstanceOf[SasContext]
    new SasPartitionReader(part, c.meta, required, opts, filters, c.analyticRpp)
  }
}

class SasPartitionReader(
    part: ReadstatInputPartition,
    meta: Sas.Metadata,
    required: StructType,
    opts: ReadstatOptions,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
    analyticRpp: Option[Long] = None)
  extends PartitionReader[InternalRow] {
  import Sas._

  private val h = meta.header
  private val le = h.littleEndian
  private val cs = meta.charset

  import graft.sources.readstat.InformativeNulls._

  private final case class Plan(c: Column, decode: (Array[Byte], Int) => Any)
  private val plans: Array[Plan] = {
    val roles = SasModule.fieldsWithRoles(meta, opts).map(t => t._1.name -> t).toMap
    required.fields.map { f =>
      val (_, role, c) = roles.getOrElse(f.name,
        throw new IllegalArgumentException(s"sas: no such column '${f.name}'"))
      val valueDecode = decoderFor(c)
      val decode: (Array[Byte], Int) => Any = role match {
        case RValue => valueDecode
        case RIndicator => (row, base) => indicatorFor(c, row, base)
        case RStruct => (row, base) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](valueDecode(row, base), indicatorFor(c, row, base)))
        case RMerged => (row, base) => {
          val ind = indicatorFor(c, row, base)
          if (ind != null) ind
          else {
            val d = decodeNumeric(row, base + c.offset, c.length, le)
            if (missingDouble(java.lang.Double.doubleToRawLongBits(d))) null
            else UTF8String.fromString(
              graft.sources.readstat.stata.DtaRowDecoder.renderNumber(d))
          }
        }
      }
      Plan(c, decode)
    }
  }

  /** SAS tagged missing: NaN type byte at bits[47:40]; 0xBE→.A … 0xA5→.Z,
    * 0xD2→._ (reference `src/sas/value.rs:160-214`).
    */
  private def indicatorFor(c: Column, row: Array[Byte], base: Int): UTF8String = {
    val d = decodeNumeric(row, base + c.offset, c.length, le)
    val bits = java.lang.Double.doubleToRawLongBits(d)
    if ((bits & 0x7fffffffffffffffL) < 0x7ff0000000000000L) return null // valid
    val typeByte = ((bits >> 40) & 0xff).toInt
    if (typeByte >= 0xA5 && typeByte <= 0xBE) {
      val letter = (0xFF ^ typeByte) // 0x41..0x5A
      UTF8String.fromString("." + letter.toChar)
    } else if (typeByte == 0xD2) UTF8String.fromString("._")
    else null
  }

  private def missingDouble(bits: Long): Boolean =
    (bits & 0x7fffffffffffffffL) >= 0x7ff0000000000000L

  private val csUtf8 = cs == java.nio.charset.StandardCharsets.UTF_8

  private def decoderFor(c: Column): (Array[Byte], Int) => Any = kindFor(c) match {
    case KChar => (row, base) => {
      val off = base + c.offset
      var end = c.length
      while (end > 0 && (row(off + end - 1) == ' ' || row(off + end - 1) == 0)) end -= 1
      var nul = 0
      var ascii = true
      while (nul < end && row(off + nul) != 0) {
        if (row(off + nul) < 0) ascii = false
        nul += 1
      }
      end = math.min(end, nul)
      if (end == 0) { if (opts.missingStringAsNull) null else UTF8String.fromString("") }
      else if (ascii) UTF8String.fromBytes(java.util.Arrays.copyOfRange(row, off, off + end))
      else if (csUtf8) {
        // valid UTF-8 wraps directly (hot path); invalid bytes fall back to
        // the lossy java decode (U+FFFD)
        val s = UTF8String.fromBytes(java.util.Arrays.copyOfRange(row, off, off + end))
        if (s.isValid) s else UTF8String.fromString(new String(row, off, end, cs))
      } else UTF8String.fromString(new String(row, off, end, cs))
    }
    case KNumeric => (row, base) => {
      val d = decodeNumeric(row, base + c.offset, c.length, le)
      if (missingDouble(java.lang.Double.doubleToRawLongBits(d))) null
      else java.lang.Double.valueOf(d)
    }
    case KDate => (row, base) => {
      val d = decodeNumeric(row, base + c.offset, c.length, le)
      if (missingDouble(java.lang.Double.doubleToRawLongBits(d))) null
      else {
        // days since 1960, with a seconds fallback for out-of-range values
        // (reference `src/sas/polars_output.rs:322-329`)
        val days = d.toInt - EpochShiftDays.toInt
        val v = if (days >= -135080 && days <= 156935) days
        else (d / SecondsPerDay).toInt - EpochShiftDays.toInt
        java.lang.Integer.valueOf(v)
      }
    }
    case KDateTime => (row, base) => {
      val d = decodeNumeric(row, base + c.offset, c.length, le)
      if (missingDouble(java.lang.Double.doubleToRawLongBits(d))) null
      else java.lang.Long.valueOf(((d - EpochShiftDays * SecondsPerDay) * 1e6).toLong)
    }
    case KTime => (row, base) => {
      val d = decodeNumeric(row, base + c.offset, c.length, le)
      if (missingDouble(java.lang.Double.doubleToRawLongBits(d))) null
      else java.lang.Long.valueOf((d * 1e9).toLong)
    }
  }

  // ---- page iteration ----
  private val fsin = ReadstatIO.open(part.path)
  private var in: BufferedInputStream = _
  private val page = new Array[Byte](h.pageLength)
  private val out = new GenericInternalRow(plans.length)

  private var remaining = part.rowCount
  private var toSkip = 0L

  // state within the current page
  private var rowsLeftOnPage = 0
  private var rowOffset = 0
  private var rowStep = meta.rowLength
  // compressed: subheader row list of (offset, length)
  private var subRows: IndexedSeq[(Int, Int)] = IndexedSeq.empty
  private var subIdx = 0
  private var decompressed: Array[Byte] = _

  locally {
    // a partition starting past the MIX prefix seeks straight to its DATA
    // page (driver-validated actual rows/page); anything else scans from
    // the first page, skipping rows
    val dataIdx = part.rowStart - meta.mixDataRows
    if (analyticRpp.isDefined && dataIdx >= 0 && part.rowStart > 0) {
      val rpp = analyticRpp.get
      val pageIdx = meta.firstDataPage + dataIdx / rpp
      fsin.seek(h.headerLength.toLong + pageIdx * h.pageLength)
      toSkip = dataIdx % rpp
    } else {
      fsin.seek(h.headerLength.toLong)
      toSkip = part.rowStart
    }
    in = new BufferedInputStream(fsin, 4 << 20)
  }

  // P4 EXT: decode-skip on pushed filters (residual filters re-applied above)
  private val filterEval: (Array[Byte], Int) => Boolean =
    if (filters.isEmpty) (_, _) => true
    else {
      import graft.sources.readstat.RowFilter
      val roles = SasModule.fieldsWithRoles(meta, opts).map(t => t._1.name -> t).toMap
      val names = filters.flatMap(RowFilter.referenced).flatten.distinct
      val fdec = names.map { n =>
        val (_, _, c) = roles(n)
        n -> decoderFor(c)
      }.toMap
      (buf: Array[Byte], base: Int) => {
        val value = (n: String) => fdec(n)(buf, base)
        filters.forall(f => RowFilter.eval(f, value))
      }
    }

  // current physical row (fields, not a per-row tuple — hot path)
  private var curBuf: Array[Byte] = _
  private var curBase = 0

  override def next(): Boolean = {
    if (remaining <= 0) return false
    while (true) {
      if (!nextRowBytes()) return false
      if (toSkip > 0) toSkip -= 1
      else {
        remaining -= 1
        if (filterEval(curBuf, curBase)) {
          var i = 0
          while (i < plans.length) {
            out.update(i, plans(i).decode(curBuf, curBase))
            i += 1
          }
          return true
        }
        if (remaining <= 0) return false
      }
    }
    false
  }

  /** Advances curBuf/curBase to the next physical row; false at EOF. */
  private def nextRowBytes(): Boolean = {
    while (true) {
      if (rowsLeftOnPage > 0) {
        curBuf = page
        curBase = rowOffset
        rowOffset += rowStep
        rowsLeftOnPage -= 1
        return true
      }
      if (subIdx < subRows.length) {
        val (off, len) = subRows(subIdx)
        subIdx += 1
        if (len < meta.rowLength) {
          decompressed = meta.compression match {
            case CRdc => SasDecompress.rdc(page, off, len, meta.rowLength)
            case _ => SasDecompress.rle(page, off, len, meta.rowLength)
          }
          curBuf = decompressed
          curBase = 0
        } else {
          curBuf = page
          curBase = off
        }
        return true
      }
      if (!readFully(in, page, h.pageLength)) return false
      loadPage()
    }
    false
  }

  private def loadPage(): Unit = {
    rowsLeftOnPage = 0
    rowOffset = 0
    subRows = IndexedSeq.empty
    subIdx = 0
    val pt = pageType(page, h)
    if (pt == PData) {
      rowsLeftOnPage = blockCount(page, h)
      rowOffset = h.bitOffset + 8
    } else if (isMetaType(pt)) {
      if (meta.compression != CNone) {
        // compressed rows live in data subheaders on META pages
        subRows = subPtrs(page, h).filter { p =>
          (p.compression == 4 || p.compression == 0) && p.subType == 1 &&
            p.length <= meta.rowLength &&
            !(p.offset + 8 <= page.length && isMetadataSignature(page, p.offset))
        }.map(p => (p.offset, p.length))
      } else if (isMixType(pt)) {
        var dataStart = h.bitOffset + 8 + subheaderCount(page, h) * h.subPtrSize
        if (dataStart % 8 == 4) dataStart += 4
        val fit = (h.pageLength - dataStart) / math.max(1, meta.rowLength)
        rowsLeftOnPage = math.min(fit.toLong, meta.mixPageRowCount).toInt
        rowOffset = dataStart
      }
    }
    // other page types (AMD/METC/invalid) carry no rows for us
  }

  override def get(): InternalRow = out
  override def close(): Unit = if (in != null) in.close()
}
