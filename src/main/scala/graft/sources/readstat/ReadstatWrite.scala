package graft.sources.readstat

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StringType, StructType}

/** DSv2 write path (SURVEY.md §2.1 S8/S9):
  * `df.write.format("readstat").mode("overwrite").save("out.dta")`.
  *
  * The dta/sav containers are single sequential files with header
  * patch-back, so the sink REQUIRES a single input partition — call
  * `.coalesce(1)` first (same constraint as the reference's writer,
  * `src/stata/writer.rs:205-328`). Cluster-scale output belongs in
  * parquet; this sink exists for format parity and interchange.
  */
class ReadstatWriteBuilder(path: String, schema: StructType, opts: ReadstatOptions)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ReadstatBatchWrite(path, schema, opts)
  }
}

class ReadstatBatchWrite(path: String, schema: StructType, opts: ReadstatOptions)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    require(info.numPartitions == 1,
      s"readstat sink writes a single sequential file; call .coalesce(1) " +
        s"before writing (got ${info.numPartitions} partitions)")
    new ReadstatDataWriterFactory(path, schema, opts)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class ReadstatDataWriterFactory(path: String, schema: StructType, opts: ReadstatOptions)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ReadstatDataWriter(path, schema, opts)
}

private case class ReadstatCommit() extends WriterCommitMessage

/** Buffers the partition's rows (single-file container needs string widths
  * before the header), then writes the whole file on commit.
  */
class ReadstatDataWriter(path: String, schema: StructType, opts: ReadstatOptions)
    extends DataWriter[InternalRow] {

  private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
  private val rows = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()

  override def write(record: InternalRow): Unit =
    rows += toScala(record.copy()).asInstanceOf[org.apache.spark.sql.Row]

  override def commit(): WriterCommitMessage = {
    val local = stripScheme(path)
    val widths: Map[String, Int] = schema.fields.filter(_.dataType == StringType).map { f =>
      val i = schema.fieldIndex(f.name)
      f.name -> rows.foldLeft(1) { (m, r) =>
        if (r.isNullAt(i)) m
        else math.max(m, r.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
      }
    }.toMap
    ReadstatOptions.detectFormat(local, opts.format) match {
      case "dta" =>
        stata.DtaWriter.writeRows(schema, rows.iterator, local, widths)
      case "sav" =>
        spss.SavWriter.writeRows(schema, rows.iterator, local, widths,
          compress = false, valueLabels = Map.empty)
      case "sas7bdat" =>
        sas.SasFixtureWriter.writeRows(schema, rows.iterator, local, widths, rle = false)
      case f => throw new IllegalArgumentException(s"readstat sink: unsupported format $f")
    }
    ReadstatCommit()
  }

  override def abort(): Unit = ()
  override def close(): Unit = rows.clear()

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
}
