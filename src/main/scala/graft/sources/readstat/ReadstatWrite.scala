package graft.sources.readstat

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StringType, StructType}

/** DSv2 write path (SURVEY.md §2.1 S8/S9):
  * `df.write.format("readstat").mode("overwrite").save("out.dta")`.
  *
  * Distributed encode (r3; model: the reference's parallel chunk encode,
  * `src/stata/writer.rs:1287-1363`): every input partition encodes its rows
  * ON THE EXECUTOR into a staging part file of final-format cell bytes
  * (sentinels, epoch shifts — everything except string padding, which needs
  * the global max width). The driver then frames the single container file
  * and CONCATENATES the parts — per-cell work at assembly is a bounds check
  * and an arraycopy, so the driver stage runs at stream-copy speed. Every
  * format takes this path with any partition count; for RLE/RDC sas7bdat the
  * assembler additionally compresses each rebuilt row before packing it as a
  * data subheader (streamed META pages, O(page) memory — the reference has
  * no sas writer at all, `src/sas/writer.rs:30-33`).
  *
  * The container file itself is written driver-side (single sequential file
  * with patch-back); cluster-scale output belongs in parquet — this sink
  * exists for format parity and interchange.
  */
class ReadstatWriteBuilder(path: String, schema: StructType, opts: ReadstatOptions)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      // directory-of-containers mode (r10 verdict #3): a target WITHOUT a
      // container extension is a directory — each partition assembles its
      // own complete part-NNNNN container ON THE EXECUTOR, no driver
      // concat; a target with an extension keeps the single-container
      // interchange path below
      if (ReadstatWriteSupport.containerExtension(path).isEmpty)
        new ReadstatDirBatchWrite(path, schema, opts, doTruncate)
      else new ReadstatBatchWrite(path, schema, opts)

    // streaming sink (r11): the durable tail of the intake pipeline —
    // append-only, epoch-scoped part containers in a directory, readable
    // back by the multi-file load while the stream still runs
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(ReadstatWriteSupport.containerExtension(path).isEmpty,
        s"readstat streaming sink: '$path' names a single container — a " +
          "stream appends epoch part files, so the target must be a " +
          "directory (no container extension) + option(\"format\", ...)")
      require(!doTruncate,
        "readstat streaming sink is append-only (complete/truncate output " +
          "modes would rewrite history; use outputMode(\"append\"))")
      new ReadstatStreamingWrite(path, schema, opts)
    }
  }
}

private[readstat] final case class ReadstatPartMsg(
    pid: Int,
    rows: Long,
    /** max UTF-8 byte width per schema field (−1 for non-strings). */
    widths: Array[Int],
    partPath: String) extends WriterCommitMessage

class ReadstatBatchWrite(path: String, schema: StructType, opts: ReadstatOptions)
    extends BatchWrite {

  private val format = ReadstatOptions.detectFormat(path, opts.format)
  private val stagingDir = path + ".spill-parts"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ReadstatPartWriterFactory(stagingDir, schema, format)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.collect { case m: ReadstatPartMsg => m }.sortBy(_.pid)
    if (parts.isEmpty) return
    try ReadstatWriteSupport.assembleContainer(schema, parts, path, format, opts)
    finally ReadstatWriteSupport.deleteDir(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ReadstatWriteSupport.deleteDir(stagingDir)
}

class ReadstatPartWriterFactory(stagingDir: String, schema: StructType, format: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ReadstatPartWriter(
      s"$stagingDir/part-$partitionId-$taskId", partitionId, schema, format)
}

/** Executor-side: streams rows through the format's final-byte cell
  * encoders into one staging part file; tracks string widths and row count
  * for the driver's framing pass. O(1) memory in the row count.
  */
class ReadstatPartWriter(partPath: String, pid: Int, schema: StructType, format: String)
    extends DataWriter[InternalRow] {

  private val encoders = format match {
    case "dta" => stata.DtaWriter.spillEncoders(schema)
    case "sas7bdat" => sas.SasFixtureWriter.spillEncoders(schema)
    case _ => spss.SavWriter.spillEncoders(schema)
  }
  private val stringIdx: Array[Int] =
    schema.fields.zipWithIndex.collect { case (f, i) if f.dataType == StringType => i }
  private val widths = Array.fill(schema.fields.length)(-1)
  stringIdx.foreach(widths(_) = 0)

  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(ReadstatWriteSupport.create(partPath), 1 << 20))
  private var nRows = 0L

  override def write(record: InternalRow): Unit = {
    var s = 0
    while (s < stringIdx.length) {
      val i = stringIdx(s)
      if (!record.isNullAt(i)) {
        val n = record.getUTF8String(i).numBytes()
        if (n > widths(i)) widths(i) = n
      }
      s += 1
    }
    var c = 0
    while (c < encoders.length) {
      encoders(c)(record, out)
      c += 1
    }
    nRows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    ReadstatPartMsg(pid, nRows, widths, partPath)
  }

  override def abort(): Unit = {
    out.close()
    ReadstatWriteSupport.delete(partPath)
  }
  override def close(): Unit = ()
}

/** Directory-of-containers write (r10 verdict #3):
  * `df.write.format("readstat").option("format","dta").save("dir/")`.
  * Each input partition spills executor-side exactly like the
  * single-container path, then assembles its OWN complete part-NNNNN
  * container at task commit — the driver concatenates nothing, so bulk
  * export wall time scales with partitions instead of the driver's single
  * sequential assembly. Per-part string widths are the partition's own max
  * (each container is self-consistent; Spark-level schemas still agree
  * across parts, so the existing multi-file directory load reads the set
  * back unchanged). Empty partitions write no container; an all-empty
  * write emits one zero-row part so the directory reads back as an empty
  * table rather than failing the load.
  */
class ReadstatDirBatchWrite(
    dir: String,
    schema: StructType,
    opts: ReadstatOptions,
    doTruncate: Boolean) extends BatchWrite {

  private val format = opts.format.getOrElse(throw new IllegalArgumentException(
    s"readstat sink: '$dir' has no container extension — directory mode " +
      "needs option(\"format\", \"dta\"|\"sav\"|\"zsav\"|\"sas7bdat\")"))
  private val ext = ReadstatWriteSupport.extensionFor(format)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // overwrite semantics: clear previous part containers before tasks
    // write (the parquet directory-overwrite shape)
    if (doTruncate) ReadstatWriteSupport.deleteDir(dir)
    new ReadstatDirWriterFactory(dir, ext, schema, format, opts)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val nonEmpty = messages.collect { case m: ReadstatPartMsg if m.rows > 0 => m }
    if (nonEmpty.isEmpty) {
      // all-empty write: one zero-row container keeps the directory readable
      ReadstatWriteSupport.assembleContainer(
        schema, Seq.empty, s"$dir/part-00000$ext", format, opts)
    }
    ReadstatWriteSupport.deleteDir(s"$dir/.spill-parts")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ReadstatWriteSupport.deleteDir(s"$dir/.spill-parts")
}

class ReadstatDirWriterFactory(
    dir: String, ext: String, schema: StructType, format: String, opts: ReadstatOptions)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ReadstatDirPartWriter(dir, ext, partitionId, taskId, schema, format, opts)
}

/** Executor-side: spill the partition (same final-byte cell encoding as the
  * single-container path), then assemble this partition's complete
  * container at task commit. The spill indirection exists because string
  * widths are only known after the last row.
  */
class ReadstatDirPartWriter(
    dir: String, ext: String, pid: Int, taskId: Long,
    schema: StructType, format: String, opts: ReadstatOptions,
    filePrefix: String = "part-")
    extends DataWriter[InternalRow] {

  private val spillPath = s"$dir/.spill-parts/$filePrefix$pid-$taskId"
  private val inner = new ReadstatPartWriter(spillPath, pid, schema,
    if (format == "zsav") "sav" else format)

  override def write(record: InternalRow): Unit = inner.write(record)

  override def commit(): WriterCommitMessage = {
    val m = inner.commit().asInstanceOf[ReadstatPartMsg]
    if (m.rows == 0L) { ReadstatWriteSupport.delete(spillPath); return m }
    val outPath = f"$dir/$filePrefix$pid%05d$ext"
    ReadstatWriteSupport.assembleContainer(schema, Seq(m), outPath, format, opts)
    ReadstatWriteSupport.delete(spillPath)
    m.copy(partPath = outPath)
  }

  override def abort(): Unit = {
    inner.abort()
    ReadstatWriteSupport.delete(spillPath)
  }
  override def close(): Unit = ()
}

/** Streaming sink (r11): each epoch's partitions assemble complete
  * `part-e<epoch>-<pid>` containers ON THE EXECUTOR — the directory-write
  * machinery with epoch-scoped names, which is also what makes failure
  * recovery idempotent: a replayed epoch regenerates the SAME file names
  * from the same data, so re-commits overwrite rather than duplicate
  * (the FileStreamSink manifest discipline achieved through deterministic
  * naming instead of a manifest — readstat readers list directories, so
  * the file set itself must be the truth). Empty epochs write nothing.
  * Composes upstream with the intake gates ([[graft.streaming.DocStreams]])
  * and downstream with the multi-file batch load (+ mergeSchema, +
  * PERMISSIVE) — a reader can follow the directory while the stream runs.
  */
class ReadstatStreamingWrite(dir: String, schema: StructType, opts: ReadstatOptions)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val format = opts.format.getOrElse(throw new IllegalArgumentException(
    s"readstat streaming sink: '$dir' has no container extension — " +
      "option(\"format\", \"dta\"|\"sav\"|\"zsav\"|\"sas7bdat\") is required"))
  private val ext = ReadstatWriteSupport.extensionFor(format)

  private def prefix(epochId: Long): String = f"part-e$epochId%06d-"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new ReadstatStreamWriterFactory(dir, ext, schema, format, opts)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    // parts were assembled at task commit (epoch-scoped names); only the
    // spill staging remains to clear. Epochs are serial per query, so the
    // shared staging dir is quiescent here.
    ReadstatWriteSupport.deleteDir(s"$dir/.spill-parts")

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // tear out anything this epoch already materialized: the retry will
    // regenerate the same names, but a PERMANENTLY failed query must not
    // leave a half-epoch for readers
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(ReadstatIO.sessionConf)
    if (fs.exists(hp) && fs.getFileStatus(hp).isDirectory)
      fs.listStatus(hp).filter(_.getPath.getName.startsWith(prefix(epochId)))
        .foreach(st => fs.delete(st.getPath, false))
    ReadstatWriteSupport.deleteDir(s"$dir/.spill-parts")
  }
}

class ReadstatStreamWriterFactory(
    dir: String, ext: String, schema: StructType, format: String, opts: ReadstatOptions)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ReadstatDirPartWriter(dir, ext, partitionId, taskId, schema, format, opts,
      filePrefix = f"part-e$epochId%06d-")
}

/** Driver-side assemblers + small FS/JSON helpers shared by the sink. */
object ReadstatWriteSupport {
  import org.apache.spark.sql.types._

  def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Some(ext) when the path names a single container; None → directory. */
  def containerExtension(p: String): Option[String] = {
    val n = p.toLowerCase
    Seq(".dta", ".sav", ".zsav", ".sas7bdat").find(n.endsWith)
  }

  def extensionFor(format: String): String = format match {
    case "dta" => ".dta"
    case "sav" => ".sav"
    case "zsav" => ".zsav"
    case "sas7bdat" => ".sas7bdat"
    case f => throw new IllegalArgumentException(s"readstat sink: unsupported format $f")
  }

  /** One container from encoded spill parts — the format dispatch shared by
    * the single-container driver assembly and the directory mode's per-task
    * executor assembly. Global string widths come from the given parts
    * (min 1); `path` keeps its extension semantics (`.zsav` implies zlib).
    */
  private[readstat] def assembleContainer(
      schema: StructType,
      parts: Seq[ReadstatPartMsg],
      path: String,
      format: String,
      opts: ReadstatOptions): Long = {
    val local = stripScheme(path)
    val widths: Map[String, Int] = schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == StringType =>
        f.name -> math.max(1, parts.map(_.widths(i)).foldLeft(0)(math.max))
    }.toMap
    val vlJson = parseLabelMap(opts.valueLabels)
    val varLabels = parseStringMap(opts.variableLabels)
    format match {
      case "dta" => assembleDta(
        schema, parts, widths, local,
        vlJson.map { case (c, m) => c -> m.map { case (k, v) => k.toInt -> v } },
        varLabels)
      case "sav" | "zsav" =>
        val zsav = local.toLowerCase.endsWith(".zsav")
        assembleSav(
          schema, parts, widths, local,
          compress = zsav || opts.compression.contains("bytecode"),
          valueLabels = vlJson.map { case (c, m) => c -> m.map { case (k, v) => k.toDouble -> v } },
          zsav = zsav,
          missingValues = parseListMap(opts.missingValues)
            .map { case (c, vs) => c -> vs.map(_.toDouble) },
          stringValueLabels = parseLabelMap(opts.stringValueLabels),
          stringMissingValues = parseListMap(opts.stringMissingValues))
      case "sas7bdat" =>
        val rdc = opts.compression.contains("rdc")
        if (rdc || opts.compression.contains("rle"))
          assembleSasCompressed(schema, parts, widths, local, rdc)
        else assembleSas(schema, parts, widths, local)
      case f => throw new IllegalArgumentException(s"readstat sink: unsupported format $f")
    }
  }

  def create(path: String): java.io.OutputStream = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(ReadstatIO.sessionConf).create(hp, true)
  }

  def delete(path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(ReadstatIO.sessionConf)
    if (fs.exists(hp)) fs.delete(hp, false)
  }

  def deleteDir(path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(ReadstatIO.sessionConf)
    if (fs.exists(hp)) fs.delete(hp, true)
  }

  private def partStream(m: ReadstatPartMsg): java.io.DataInputStream =
    new java.io.DataInputStream(
      new java.io.BufferedInputStream(ReadstatIO.open(m.partPath), 1 << 20))

  /** Frames the dta container around the executor-encoded parts: numeric
    * cells copy verbatim, strings pad to the global width (or become strL
    * refs with blobs collected for the GSO table).
    */
  private[readstat] def assembleDta(
      schema: StructType,
      parts: Seq[ReadstatPartMsg],
      widths: Map[String, Int],
      path: String,
      valueLabels: Map[String, Map[Int, String]],
      variableLabels: Map[String, String]): Long = {
    import stata.DtaWriter
    import stata.DtaWriter.{KStr, KStrL}
    val specs = schema.fields.map(f =>
      DtaWriter.specFor(f, widths.getOrElse(f.name, 1)))
    DtaWriter.writeFramed(schema, specs, path, valueLabels, variableLabels) { sink =>
      var rowIdx = 0L
      val vBytes = if (sink.version >= 119) 3 else 2
      parts.foreach { m =>
        val in = partStream(m)
        try {
          var r = 0L
          while (r < m.rows) {
            sink.clearRow()
            var off = 0
            var i = 0
            while (i < specs.length) {
              specs(i).kind match {
                case KStr(w) =>
                  val len = in.readInt()
                  if (len > 0) {
                    require(len <= w, s"string too long for str$w: ${specs(i).name}")
                    in.readFully(sink.rowBuf, off, len)
                  }
                case KStrL =>
                  val len = in.readInt()
                  if (len >= 0) {
                    val blob = new Array[Byte](len)
                    in.readFully(blob)
                    val v = i + 1
                    val o = rowIdx + 1
                    sink.strls += ((v, o, blob))
                    // v118: v(2)+o(6); v119: v(3)+o(5) — both little-endian
                    var k = 0
                    while (k < vBytes) { sink.rowBuf(off + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
                    k = 0
                    while (k < 8 - vBytes) { sink.rowBuf(off + vBytes + k) = ((o >> (8 * k)) & 0xff).toByte; k += 1 }
                  }
                case k =>
                  in.readFully(sink.rowBuf, off, k.width)
              }
              off += specs(i).kind.width
              i += 1
            }
            sink.emitRow()
            rowIdx += 1
            r += 1
          }
        } finally in.close()
      }
      rowIdx
    }
  }

  /** Frames the sav container around the executor-encoded parts: numeric
    * cells pass through as f64 bits (codec-aware), strings lay into their
    * segment regions at the global width.
    */
  private[readstat] def assembleSav(
      schema: StructType,
      parts: Seq[ReadstatPartMsg],
      widths: Map[String, Int],
      path: String,
      compress: Boolean,
      valueLabels: Map[String, Map[Double, String]],
      zsav: Boolean,
      missingValues: Map[String, Seq[Double]] = Map.empty,
      stringValueLabels: Map[String, Map[String, String]] = Map.empty,
      stringMissingValues: Map[String, Seq[String]] = Map.empty): Long = {
    import spss.SavWriter
    val specs = SavWriter.buildSpecs(schema, widths)
    val isString = schema.fields.map(_.dataType == StringType)
    SavWriter.writeFramed(schema, specs, path, compress, valueLabels,
      missingValues = missingValues, zsav = zsav,
      stringValueLabels = stringValueLabels,
      stringMissingValues = stringMissingValues) { sink =>
      var n = 0L
      parts.foreach { m =>
        val in = partStream(m)
        try {
          var r = 0L
          while (r < m.rows) {
            var i = 0
            while (i < specs.length) {
              if (isString(i)) {
                val len = in.readInt()
                val bytes = if (len <= 0) Array.emptyByteArray else {
                  val b = new Array[Byte](len)
                  in.readFully(b)
                  b
                }
                sink.stringCell(specs(i), bytes)
              } else {
                sink.numericBits(java.lang.Long.reverseBytes(in.readLong()))
              }
              i += 1
            }
            n += 1
            r += 1
          }
        } finally in.close()
      }
      n
    }
  }

  /** Frames uncompressed sas7bdat pages around the executor-encoded parts:
    * numeric cells copy verbatim (8-byte bits, epochs/missing done on the
    * executors), strings space-pad to the global width. The page framer
    * needs the total row count up front — the part messages carry it.
    */
  private[readstat] def assembleSas(
      schema: StructType,
      parts: Seq[ReadstatPartMsg],
      widths: Map[String, Int],
      path: String): Long = {
    import sas.SasFixtureWriter
    val cols = SasFixtureWriter.colsFor(schema, widths)
    val nRows = parts.map(_.rows).sum
    var in: java.io.DataInputStream = null
    var partIdx = 0
    var leftInPart = 0L
    SasFixtureWriter.writeFramedStreaming(schema, widths, path, nRows) { (page, base, _) =>
      while (leftInPart == 0) {
        if (in != null) in.close()
        require(partIdx < parts.length, "sas assembler: ran out of parts")
        in = partStream(parts(partIdx))
        leftInPart = parts(partIdx).rows
        partIdx += 1
      }
      var off = base
      var i = 0
      while (i < cols.length) {
        val c = cols(i)
        if (c.isChar) {
          java.util.Arrays.fill(page, off, off + c.length, ' '.toByte)
          val len = in.readInt()
          if (len > 0) {
            require(len <= c.length, s"string too long for ${c.name}")
            in.readFully(page, off, len)
          }
        } else {
          in.readFully(page, off, 8)
        }
        off += c.length
        i += 1
      }
      leftInPart -= 1
      if (leftInPart == 0 && partIdx == parts.length) { in.close(); in = null }
    }
  }

  /** Frames RLE/RDC sas7bdat around the executor-spilled parts: each row is
    * rebuilt at the global string widths, compressed, and packed as a data
    * subheader into streamed META pages — O(page) memory at any row count.
    * (The sink's generic parts are varlen, so compression happens here on
    * the driver; `SasFixtureWriter.write(df, path, rle/rdc)` is the fully
    * distributed path where executors compress.)
    */
  private[readstat] def assembleSasCompressed(
      schema: StructType,
      parts: Seq[ReadstatPartMsg],
      widths: Map[String, Int],
      path: String,
      rdc: Boolean): Long = {
    import sas.{RdcEncode, RleEncode, SasFixtureWriter}
    val cols = SasFixtureWriter.colsFor(schema, widths)
    val rowLength = cols.map(_.length).sum
    val nRows = parts.map(_.rows).sum
    SasFixtureWriter.writeCompressedFramed(schema, widths, path, nRows, rdc) { emit =>
      val rowBuf = new Array[Byte](math.max(rowLength, 1))
      parts.foreach { m =>
        val in = partStream(m)
        try {
          var r = 0L
          while (r < m.rows) {
            var off = 0
            var i = 0
            while (i < cols.length) {
              val c = cols(i)
              if (c.isChar) {
                java.util.Arrays.fill(rowBuf, off, off + c.length, ' '.toByte)
                val len = in.readInt()
                if (len > 0) {
                  require(len <= c.length, s"string too long for ${c.name}")
                  in.readFully(rowBuf, off, len)
                }
              } else {
                in.readFully(rowBuf, off, 8)
              }
              off += c.length
              i += 1
            }
            val comp = if (rdc) RdcEncode.encode(rowBuf) else RleEncode.encode(rowBuf)
            if (comp.length < rowLength) emit(comp, comp.length)
            else emit(rowBuf, rowLength) // reader treats len==rowLength as raw
            r += 1
          }
        } finally in.close()
      }
    }
    nRows
  }

  /** JSON `{"col":{"code":"label",...},...}` → nested map. */
  def parseLabelMap(js: Option[String]): Map[String, Map[String, String]] =
    js.map { s =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(s)
      val cols = Map.newBuilder[String, Map[String, String]]
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val inner = Map.newBuilder[String, String]
        val it2 = e.getValue.fields()
        while (it2.hasNext) { val f = it2.next(); inner += f.getKey -> f.getValue.asText() }
        cols += e.getKey -> inner.result()
      }
      cols.result()
    }.getOrElse(Map.empty)

  /** JSON `{"col":["a","b"],...}` → map of lists (values as text). */
  def parseListMap(js: Option[String]): Map[String, Seq[String]] =
    js.map { s =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(s)
      val cols = Map.newBuilder[String, Seq[String]]
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val arr = e.getValue
        require(arr.isArray, s"expected JSON array for ${e.getKey}")
        cols += e.getKey -> (0 until arr.size()).map(i => arr.get(i).asText())
      }
      cols.result()
    }.getOrElse(Map.empty)

  /** JSON `{"col":"label",...}` → map. */
  def parseStringMap(js: Option[String]): Map[String, String] =
    js.map { s =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(s)
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }.getOrElse(Map.empty)
}
