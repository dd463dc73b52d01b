package graft.sources.readstat.spss

import java.io.{BufferedOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** SPSS `.sav` writer (S9 in SURVEY.md §2.1): header, variable records with
  * continuations, numeric value labels, long-variable-name record, encoding
  * record (UTF-8), and data at compression 0 (raw) or 1 (bytecode).
  *
  * Single-file sink like the dta writer; doubles as the fixture generator
  * for the sav read path (FIXTURES.md §4).
  */
object SavWriter {

  final case class Spec(
      name: String, shortName: String, dataType: DataType,
      isString: Boolean, stringLen: Int, widthSegments: Int, formatType: Int)

  /** Executor-side spill encoders for the distributed sink: numerics spill
    * as FINAL little-endian f64 bits (sysmis for null, epoch shifts done);
    * strings as i32 length (−1 = null) + UTF-8 bytes — the driver assembler
    * does segment layout/padding, which needs global widths.
    */
  private[readstat] def spillEncoders(
      schema: StructType): Array[(org.apache.spark.sql.catalyst.InternalRow, java.io.DataOutputStream) => Unit] = {
    def le64(o: java.io.DataOutputStream, v: Long): Unit = {
      var i = 0
      while (i < 8) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    schema.fields.zipWithIndex.map { case (f, i) =>
      val isTime = f.metadata.contains("logical_type") &&
        f.metadata.getString("logical_type") == "time"
      def num(get: org.apache.spark.sql.catalyst.InternalRow => Double) =
        (r: org.apache.spark.sql.catalyst.InternalRow, o: java.io.DataOutputStream) =>
          le64(o, if (r.isNullAt(i)) Sav.MissingDoubleBits
          else java.lang.Double.doubleToLongBits(get(r)))
      f.dataType match {
        case StringType => (r: org.apache.spark.sql.catalyst.InternalRow, o: java.io.DataOutputStream) =>
          if (r.isNullAt(i)) o.writeInt(-1)
          else {
            val b = r.getUTF8String(i).getBytes
            o.writeInt(b.length)
            o.write(b)
          }
        case DateType => num(r => (r.getInt(i).toLong * 86400L + Sav.SecShift).toDouble)
        case TimestampNTZType | TimestampType =>
          // whole seconds: the sav datetime epoch math is second-granular
          num(r => (Math.floorDiv(r.getLong(i), 1000000L) + Sav.SecShift).toDouble)
        case LongType if isTime => num(r => (r.getLong(i) / 1000000000L).toDouble)
        case ByteType => num(r => r.getByte(i).toDouble)
        case ShortType => num(r => r.getShort(i).toDouble)
        case IntegerType => num(r => r.getInt(i).toDouble)
        case LongType => num(r => r.getLong(i).toDouble)
        case FloatType => num(r => r.getFloat(i).toDouble)
        case DoubleType => num(r => r.getDouble(i))
        case BooleanType => num(r => if (r.getBoolean(i)) 1.0 else 0.0)
        case dt => throw new IllegalArgumentException(
          s"readstat sink: unsupported type $dt for ${f.name}")
      }
    }
  }

  private[readstat] def buildSpecs(schema: StructType, widths: Map[String, Int]): Array[Spec] = {
    val used = scala.collection.mutable.Set[String]()
    schema.fields.zipWithIndex.map { case (f, idx) =>
      val isTime = f.metadata.contains("logical_type") &&
        f.metadata.getString("logical_type") == "time"
      val (isString, strLen, fmt) = f.dataType match {
        case StringType => (true, math.max(1, widths.getOrElse(f.name, 1)), 0)
        case DateType => (false, 0, 20)
        case TimestampNTZType | TimestampType => (false, 0, 22)
        case LongType if isTime => (false, 0, 21)
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
             BooleanType => (false, 0, 0)
        case dt => throw new IllegalArgumentException(s"sav writer: unsupported type $dt")
      }
      // very long strings (>255B): ceil(len/252) segments of 32 units each
      val width =
        if (!isString) 1
        else if (strLen <= 255) (strLen + 7) / 8
        else ((strLen + 251) / 252) * 32
      // short name: uppercase ≤8, unique; else positional
      val cand = f.name.toUpperCase.replaceAll("[^A-Z0-9_]", "_").take(8)
      val short =
        if (cand.nonEmpty && cand.head.isLetter && !used.contains(cand)) cand
        else {
          var i = idx
          var c = s"V$i"
          while (used.contains(c)) { i += 1; c = s"V$i" }
          c
        }
      used += short
      Spec(f.name, short, f.dataType, isString, strLen, width, fmt)
    }
  }

  /** All cases route through the distributed DSv2 sink (r4 verdict #3 —
    * declared missings / string labels / string missings previously fell
    * back to a driver-side `toLocalIterator` row loop, the last
    * driver-bottleneck write path): executors encode part buffers in
    * parallel; the driver frames the container and threads the extras into
    * the variable-record / subtype-21 / subtype-22 framing.
    */
  def write(
      df: DataFrame,
      path: String,
      compress: Boolean = false,
      valueLabels: Map[String, Map[Double, String]] = Map.empty,
      missingValues: Map[String, Seq[Double]] = Map.empty,
      stringValueLabels: Map[String, Map[String, String]] = Map.empty,
      stringMissingValues: Map[String, Seq[String]] = Map.empty): Unit = {
    val zsav = path.toLowerCase.endsWith(".zsav")
    var w = df.write.format("readstat").mode("overwrite")
    if (compress && !zsav) w = w.option("compression", "bytecode")
    if (valueLabels.nonEmpty)
      w = w.option("valueLabels", graft.sources.readstat.stata.DtaWriter.labelsJson(
        valueLabels.map { case (c, m) =>
          c -> m.map { case (k, v) => k.toString -> v }
        }))
    if (missingValues.nonEmpty)
      w = w.option("missingValues", jsonListMap(missingValues.map {
        case (c, vs) => c -> vs.map(v => v: Any)
      }))
    if (stringValueLabels.nonEmpty)
      w = w.option("stringValueLabels", jsonNestedMap(stringValueLabels))
    if (stringMissingValues.nonEmpty)
      w = w.option("stringMissingValues", jsonListMap(stringMissingValues.map {
        case (c, vs) => c -> vs.map(v => v: Any)
      }))
    w.save(path)
  }

  private def jsonListMap(m: Map[String, Seq[Any]]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    m.foreach { case (c, vs) =>
      val arr = root.putArray(c)
      vs.foreach {
        case d: Double => arr.add(d)
        case s: String => arr.add(s)
        case x => arr.add(x.toString)
      }
    }
    mapper.writeValueAsString(root)
  }

  private def jsonNestedMap(m: Map[String, Map[String, String]]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    m.foreach { case (c, inner) =>
      val o = root.putObject(c)
      inner.foreach { case (k, v) => o.put(k, v) }
    }
    mapper.writeValueAsString(root)
  }

  def writeRows(
      schema: StructType,
      rows: Iterator[Row],
      path: String,
      stringWidths: Map[String, Int],
      compress: Boolean,
      valueLabels: Map[String, Map[Double, String]],
      missingValues: Map[String, Seq[Double]] = Map.empty,
      zsav: Boolean = false,
      stringValueLabels: Map[String, Map[String, String]] = Map.empty,
      stringMissingValues: Map[String, Seq[String]] = Map.empty): Long = {
    val specs = buildSpecs(schema, stringWidths)
    writeFramed(schema, specs, path, compress, valueLabels, missingValues, zsav,
      stringValueLabels, stringMissingValues) { sink =>
      var n = 0L
      while (rows.hasNext) {
        val row = rows.next()
        var ci = 0
        specs.foreach { s =>
          if (s.isString) {
            val bytes =
              if (row.isNullAt(ci)) Array.emptyByteArray
              else row.getString(ci).getBytes(StandardCharsets.UTF_8)
            sink.stringCell(s, bytes)
          } else {
            if (row.isNullAt(ci)) sink.numericBits(Sav.MissingDoubleBits)
            else sink.numericBits(
              java.lang.Double.doubleToLongBits(numericValue(s, row, ci)))
          }
          ci += 1
        }
        n += 1
      }
      n
    }
  }

  /** Per-cell emission surface for the data section: routes through the
    * bytecode codec when compressing, raw LE doubles otherwise; lays very
    * long strings into their 252-per-256 segment regions. Driven by the
    * writeRows Row loop and by the distributed sink's byte-level assembler.
    */
  final class SavCellSink private[SavWriter] (
      codec: BytecodeEncoder, wr: Array[Byte] => Unit) {
    private val cellBuf = new Array[Byte](8)

    def numericBits(bits: Long): Unit =
      if (codec == null) wr(leBits(bits))
      else if (bits == Sav.MissingDoubleBits) codec.sysmiss()
      else codec.numCell(java.lang.Double.longBitsToDouble(bits))

    def stringCell(s: Spec, bytes: Array[Byte]): Unit = {
      require(bytes.length <= s.stringLen, s"sav: string too long for ${s.name}")
      // lay the content into the record region: contiguous for <=255,
      // 252 bytes per 256-byte chunk for very long strings
      val region = new Array[Byte](s.widthSegments * 8)
      java.util.Arrays.fill(region, ' '.toByte)
      if (s.stringLen <= 255) System.arraycopy(bytes, 0, region, 0, bytes.length)
      else {
        var seg = 0
        var done = 0
        while (done < bytes.length) {
          val take = math.min(252, bytes.length - done)
          System.arraycopy(bytes, done, region, seg * 256, take)
          done += take
          seg += 1
        }
      }
      var seg = 0
      while (seg < s.widthSegments) {
        System.arraycopy(region, seg * 8, cellBuf, 0, 8)
        if (codec != null) codec.strCell(cellBuf) else wr(cellBuf.clone())
        seg += 1
      }
    }
  }

  /** Writes the full sav container frame — header, dictionary records,
    * encoding record, zsav blocks, row-count patch-back — around a data
    * section produced by `data` (which returns the row count).
    */
  def writeFramed(
      schema: StructType,
      specs: Array[Spec],
      path: String,
      compress: Boolean,
      valueLabels: Map[String, Map[Double, String]],
      missingValues: Map[String, Seq[Double]] = Map.empty,
      zsav: Boolean = false,
      stringValueLabels: Map[String, Map[String, String]] = Map.empty,
      stringMissingValues: Map[String, Seq[String]] = Map.empty)(
      data: SavCellSink => Long): Long = {
    val nominalCaseSize = specs.map(_.widthSegments).sum

    val os = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    var bytesOut = 0L
    def wr(b: Array[Byte]): Unit = { os.write(b); bytesOut += b.length }
    def u32(v: Int): Unit = wr(Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte))
    def f64le(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((bits >> (8 * i)) & 0xff).toByte; i += 1 }
      b
    }

    // ---- header (row count patched at the end) ----
    val header = new Array[Byte](176)
    (if (zsav) "$FL3" else "$FL2").getBytes(StandardCharsets.US_ASCII).copyToArray(header, 0)
    "@(#) SPSS DATA FILE graft".getBytes(StandardCharsets.US_ASCII).copyToArray(header, 4)
    writeI32(header, 64, 2)
    writeI32(header, 68, nominalCaseSize)
    writeI32(header, 72, if (zsav) 2 else if (compress) 1 else 0)
    writeI32(header, 80, -1) // patched
    java.lang.System.arraycopy(f64le(100.0), 0, header, 84, 8)
    wr(header)

    // ---- variable records ----
    def varRecord(typ: Int, name: String, miss: Seq[Double], fmt: Int): Unit = {
      u32(2); u32(typ); u32(0); u32(miss.size)
      u32(fmt); u32(fmt)
      wr(fixed(name.getBytes(StandardCharsets.US_ASCII), 8, ' '.toByte))
      miss.foreach(m => wr(f64le(m)))
    }
    def continuation(): Unit = {
      u32(2); u32(-1); u32(0); u32(0); u32(0); u32(0)
      wr(fixed(Array.emptyByteArray, 8, ' '.toByte))
    }
    specs.foreach { s =>
      val miss = if (s.isString) Seq.empty else missingValues.getOrElse(s.name, Seq.empty).take(3)
      if (s.isString && s.stringLen > 255) {
        // very-long string: one typ-255 variable per 252-byte segment
        val nSeg = (s.stringLen + 251) / 252
        (0 until nSeg).foreach { k =>
          val segName = if (k == 0) s.shortName else s"${s.shortName.take(6)}$k".take(8)
          varRecord(255, segName, Seq.empty, 0)
          (1 until 32).foreach(_ => continuation())
        }
      } else {
        varRecord(if (s.isString) s.stringLen else 0, s.shortName, miss, s.formatType << 16)
        (1 until s.widthSegments).foreach(_ => continuation())
      }
    }

    // ---- numeric value labels ----
    var segOffset = 0
    val offsets = specs.map { s => val o = segOffset; segOffset += s.widthSegments; o }
    specs.zip(offsets).foreach { case (s, off) =>
      valueLabels.get(s.name).filter(_.nonEmpty && !s.isString).foreach { mapping =>
        u32(3); u32(mapping.size)
        mapping.toSeq.sortBy(_._1).foreach { case (v, label) =>
          wr(f64le(v))
          val bytes = label.getBytes(StandardCharsets.UTF_8).take(255)
          wr(Array(bytes.length.toByte))
          val padded = ((bytes.length + 8) / 8) * 8 - 1
          wr(fixed(bytes, padded, ' '.toByte))
        }
        u32(4); u32(1); u32(off + 1)
      }
    }

    // ---- long-string value labels (subtype 21) ----
    val lsvl = specs.filter(s => s.isString && stringValueLabels.get(s.name).exists(_.nonEmpty))
    if (lsvl.nonEmpty) {
      val body = new java.io.ByteArrayOutputStream()
      def bu32(v: Int): Unit = {
        var i = 0
        while (i < 4) { body.write((v >> (8 * i)) & 0xff); i += 1 }
      }
      lsvl.foreach { s2 =>
        val nm = s2.shortName.getBytes(StandardCharsets.US_ASCII)
        bu32(nm.length); body.write(nm)
        bu32(s2.stringLen)
        val mapping = stringValueLabels(s2.name)
        bu32(mapping.size)
        mapping.toSeq.sortBy(_._1).foreach { case (v, l) =>
          val vb = v.getBytes(StandardCharsets.UTF_8)
          val lb = l.getBytes(StandardCharsets.UTF_8)
          bu32(vb.length); body.write(vb)
          bu32(lb.length); body.write(lb)
        }
      }
      val b = body.toByteArray
      u32(7); u32(21); u32(1); u32(b.length); wr(b)
    }

    // ---- long-string missing values (subtype 22) ----
    val lsmv = specs.filter(s => s.isString && stringMissingValues.get(s.name).exists(_.nonEmpty))
    if (lsmv.nonEmpty) {
      val body = new java.io.ByteArrayOutputStream()
      def bu32(v: Int): Unit = {
        var i = 0
        while (i < 4) { body.write((v >> (8 * i)) & 0xff); i += 1 }
      }
      lsmv.foreach { s2 =>
        val nm = s2.shortName.getBytes(StandardCharsets.US_ASCII)
        bu32(nm.length); body.write(nm)
        val vals = stringMissingValues(s2.name).take(3)
        body.write(vals.size)
        val width = vals.map(_.getBytes(StandardCharsets.UTF_8).length).max
        bu32(width)
        vals.foreach { v =>
          val vb = v.getBytes(StandardCharsets.UTF_8)
          body.write(vb)
          (vb.length until width).foreach(_ => body.write(' '))
        }
      }
      val b = body.toByteArray
      u32(7); u32(22); u32(1); u32(b.length); wr(b)
    }

    // ---- very long strings record (subtype 14) ----
    val vlsEntries = specs.filter(s => s.isString && s.stringLen > 255)
      .map(s => s"${s.shortName}=${s.stringLen}").mkString("\t")
    if (vlsEntries.nonEmpty) {
      val b = vlsEntries.getBytes(StandardCharsets.US_ASCII)
      u32(7); u32(14); u32(1); u32(b.length); wr(b)
    }

    // ---- long variable names ----
    val lvEntries = specs.filter(s => s.name != s.shortName)
      .map(s => s"${s.shortName}=${s.name}").mkString("\t")
    if (lvEntries.nonEmpty) {
      val b = lvEntries.getBytes(StandardCharsets.UTF_8)
      u32(7); u32(13); u32(1); u32(b.length); wr(b)
    }

    // ---- encoding record ----
    val enc = "UTF-8".getBytes(StandardCharsets.US_ASCII)
    u32(7); u32(20); u32(1); u32(enc.length); wr(enc)

    // ---- dictionary termination ----
    u32(999); u32(0)

    // ---- data ----
    val bias = 100.0
    // zsav: bytecode stream spools to a TEMP FILE (not a heap buffer — a
    // larger-than-heap dataset must still export), then deflates per block
    val spoolFile = if (zsav) java.io.File.createTempFile("graft-zsav-", ".bin") else null
    val spool = if (zsav)
      new BufferedOutputStream(new FileOutputStream(spoolFile), 1 << 20) else null
    val codec =
      if (zsav) new BytecodeEncoder(spool, bias)
      else if (compress) new BytecodeEncoder(os, bias) else null
    val n = data(new SavCellSink(codec, wr))
    if (codec != null) codec.finish()
    if (zsav) {
      spool.close()
      try writeZsavBlocks(spoolFile, bytesOut, wr, u32)
      finally spoolFile.delete()
    }
    os.close()

    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.seek(80)
      raf.write(Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    } finally raf.close()
    n
  }

  private def numericValue(s: Spec, row: Row, i: Int): Double = s.dataType match {
    case DateType =>
      val days = row.get(i) match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
        case x: java.lang.Integer => x.toLong
        case x => throw new IllegalArgumentException(s"date value: $x")
      }
      (days * 86400L + Sav.SecShift).toDouble
    case TimestampNTZType | TimestampType =>
      val micros = row.get(i) match {
        case t: java.time.LocalDateTime =>
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
        case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
        case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
        case x => throw new IllegalArgumentException(s"timestamp value: $x")
      }
      // whole seconds: the sav datetime epoch math is second-granular
      (Math.floorDiv(micros, 1000000L) + Sav.SecShift).toDouble
    case LongType if s.formatType == 21 => (row.getLong(i) / 1000000000L).toDouble
    case ByteType => row.getByte(i).toDouble
    case ShortType => row.getShort(i).toDouble
    case IntegerType => row.getInt(i).toDouble
    case LongType => row.getLong(i).toDouble
    case FloatType => row.getFloat(i).toDouble
    case DoubleType => row.getDouble(i)
    case BooleanType => if (row.getBoolean(i)) 1.0 else 0.0
    case dt => throw new IllegalArgumentException(s"sav writer: $dt")
  }

  /** zsav container: 24-byte zheader, deflate blocks, ztrailer with the
    * block index (reference `read_zsav_data` `src/spss/data.rs:1687-1761`).
    * Reads the spooled bytecode block-by-block (bounded memory) and
    * deflates blocks concurrently — deflate is the CPU cost of zsav export
    * and the blocks are independent.
    */
  private def writeZsavBlocks(
      spool: java.io.File, zheaderOfs: Long,
      wr: Array[Byte] => Unit, u32: Int => Unit): Unit = {
    val blockSize = 0x3FF000
    val total = spool.length()
    val nBlocks = ((total + blockSize - 1) / blockSize).toInt // 0 when empty
    val blockLens = (0 until nBlocks).map(i =>
      math.min(blockSize.toLong, total - i.toLong * blockSize).toInt)

    def deflateBlock(i: Int): Array[Byte] = {
      val raf = new RandomAccessFile(spool, "r")
      try {
        raf.seek(i.toLong * blockSize)
        val buf = new Array[Byte](blockLens(i))
        raf.readFully(buf)
        val bos = new java.io.ByteArrayOutputStream()
        val d = new java.util.zip.DeflaterOutputStream(bos)
        d.write(buf); d.close()
        bos.toByteArray
      } finally raf.close()
    }
    val deflated = graft.sources.readstat.ReadstatIO.parMap(0 until nBlocks)(deflateBlock)

    def u64(v: Long): Unit = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
      wr(b)
    }
    val ztrailerOfs = zheaderOfs + 24 + deflated.map(_.length.toLong).sum
    // zheader
    u64(zheaderOfs); u64(ztrailerOfs); u64(24L + 24L * nBlocks)
    // blocks
    deflated.foreach(wr)
    // ztrailer
    u64(-100L); u64(0L)
    u32(blockSize); u32(nBlocks)
    var uOfs = zheaderOfs
    var cOfs = zheaderOfs + 24
    (0 until nBlocks).foreach { i =>
      u64(uOfs); u64(cOfs)
      u32(blockLens(i)); u32(deflated(i).length)
      uOfs += blockLens(i)
      cOfs += deflated(i).length
    }
  }

  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def leBits(bits: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((bits >> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  private def fixed(b: Array[Byte], len: Int, pad: Byte): Array[Byte] = {
    val out = new Array[Byte](len)
    java.util.Arrays.fill(out, pad)
    System.arraycopy(b, 0, out, 0, math.min(b.length, len))
    out
  }

  /** Bytecode emitter: 8 control codes then their literal payloads.
    * Codes: 253 literal, 254 spaces, 255 sysmiss, 1..251 = value+bias.
    */
  private final class BytecodeEncoder(os: java.io.OutputStream, bias: Double) {
    private val codes = new Array[Byte](8)
    private val payload = new java.io.ByteArrayOutputStream()
    private var ci = 0

    private def flush(fillCode: Int): Unit = {
      if (ci == 0 && fillCode == 0) return
      while (ci < 8) { codes(ci) = fillCode.toByte; ci += 1 }
      os.write(codes)
      payload.writeTo(os)
      payload.reset()
      ci = 0
    }

    private def emit(code: Int, data: Array[Byte]): Unit = {
      if (ci == 8) flush(0)
      codes(ci) = code.toByte
      ci += 1
      if (data != null) payload.write(data)
    }

    def numCell(d: Double): Unit = {
      val c = d + bias
      // the round-trip check (c.toInt - bias == d) is essential: for a tiny
      // |d| the addition ABSORBS d (1e-69 + 100 == 100.0 exactly), so the
      // integrality test alone would encode it as code 100 and decode 0.0
      // (fuzz-caught r6)
      if (c == Math.rint(c) && c >= 1.0 && c <= 251.0 && c.toInt.toDouble - bias == d)
        emit(c.toInt, null)
      else {
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = new Array[Byte](8)
        var i = 0
        while (i < 8) { b(i) = ((bits >> (8 * i)) & 0xff).toByte; i += 1 }
        emit(253, b)
      }
    }

    def sysmiss(): Unit = emit(255, null)

    def strCell(cell: Array[Byte]): Unit = {
      var allSpace = true
      var i = 0
      while (i < 8 && allSpace) { if (cell(i) != ' '.toByte) allSpace = false; i += 1 }
      if (allSpace) emit(254, null) else emit(253, cell.clone())
    }

    def finish(): Unit = {
      emit(252, null)
      flush(0)
    }
  }
}
