package graft.sources.readstat

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType

/** Registry of per-format modules. Each module provides driver-side schema +
  * partition planning and an executor-side row reader.
  */
object ReadstatFormats {

  /** Driver-built, task-serialized decode context for one file. */
  trait FileContext extends Serializable

  trait FormatModule {
    def schema(path: String, opts: ReadstatOptions): StructType
    /** (rowStart, rowCount) ranges; a single range for sequential formats. */
    def partitionRanges(path: String, opts: ReadstatOptions): Seq[(Long, Long)]
    def fileContext(path: String, opts: ReadstatOptions): FileContext
    def reader(
        part: ReadstatInputPartition,
        ctx: FileContext,
        required: StructType,
        opts: ReadstatOptions,
        filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty): PartitionReader[InternalRow]

    /** Vectorized path: a physical-row cursor plus unboxed per-column
      * vector appenders; None → Spark falls back to the row reader.
      */
    def columnar(
        part: ReadstatInputPartition,
        ctx: FileContext,
        required: StructType,
        opts: ReadstatOptions,
        filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty): Option[(RowCursor, Array[ColumnAppender])] = None
  }

  def forName(format: String): FormatModule = format match {
    case "dta" => stata.DtaModule
    case "sav" | "zsav" => spss.SavModule
    case "sas7bdat" => sas.SasModule
    case f => throw new IllegalArgumentException(s"unsupported readstat format: $f")
  }

  def forPath(path: String, opts: ReadstatOptions): FormatModule =
    forName(ReadstatOptions.detectFormat(path, opts.format))
}
