package graft.sources.readstat.sas

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType

import graft.sources.readstat.{ReadstatFormats, ReadstatInputPartition, ReadstatOptions}

/** SAS `.sas7bdat` module (SURVEY.md §2.1 S1). Implementation lands in
  * M-SAS; the DSv2 wiring is already format-agnostic.
  */
object SasModule extends ReadstatFormats.FormatModule {
  private def nyi = throw new UnsupportedOperationException(
    "sas7bdat reader: not yet implemented (planned milestone M-SAS)")
  override def schema(path: String, opts: ReadstatOptions): StructType = nyi
  override def partitionRanges(path: String, opts: ReadstatOptions): Seq[(Long, Long)] = nyi
  override def fileContext(path: String, opts: ReadstatOptions): ReadstatFormats.FileContext = nyi
  override def reader(
      part: ReadstatInputPartition,
      ctx: ReadstatFormats.FileContext,
      required: StructType,
      opts: ReadstatOptions): PartitionReader[InternalRow] = nyi
}
