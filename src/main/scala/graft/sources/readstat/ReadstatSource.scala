package graft.sources.readstat

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 entry point: `spark.read.format("readstat").load(path)`
  * for `.sas7bdat` / `.dta` / `.sav` / `.zsav` (SURVEY.md §2.1 S1–S4, §7.1 M2).
  *
  * Architecture (idiomatic Spark, NOT a port of the reference's thread
  * pools — SURVEY.md §3.3): the driver parses header+metadata once per file;
  * `planInputPartitions` emits row-range partitions computed from the fixed
  * record length (uncompressed formats seek in O(1)), or a single partition
  * per file where decode state is sequential (compressed SAS/SPSS). Spark's
  * scheduler replaces the reference's worker threads; multi-file loads give
  * cluster-wide parallelism.
  */
class ReadstatDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "readstat"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      // minimal JSON string-array parse (Spark encodes load(paths:_*) this way)
      js.trim.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val all = single ++ multi
    require(all.nonEmpty, "readstat: no path given")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = ReadstatOptions.from(options.asCaseSensitiveMap())
    val ps = paths(options)
    // a not-yet-existing path means this is a write: the schema comes from
    // the query via LogicalWriteInfo instead
    val hp = new HPath(ps.head)
    val fs = FileSystem.get(hp.toUri, new Configuration())
    if (!fs.exists(hp)) new StructType()
    else ReadstatFormats.forPath(ps.head, opts).schema(ps.head, opts)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new ReadstatTable(paths(options), schema, ReadstatOptions.from(properties))
  }
}

class ReadstatTable(ps: Seq[String], tableSchema: StructType, opts: ReadstatOptions)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"readstat(${ps.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ReadstatScanBuilder(ps, tableSchema, opts)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ReadstatWriteBuilder(ps.head, info.schema(), opts)
}

/** Pushdown surface (SURVEY.md §2.2 P1/P2/P3): column pruning reaches the
  * byte decoder (unprojected cells are never parsed), limit and offset
  * shrink the planned row ranges.
  */
class ReadstatScanBuilder(ps: Seq[String], full: StructType, opts: ReadstatOptions)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownOffset
    with SupportsPushDownFilters {

  private var required: StructType = full
  private var limit: Option[Long] = None
  private var offset: Long = 0L
  private var skipFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  /** P4 EXT: filters are used as decode-skip hints only; ALL of them are
    * returned as residual so Spark still applies them above the scan.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    val names = full.fieldNames.toSet
    skipFilters = filters.filter(f =>
      RowFilter.referenced(f).exists(_.forall(names.contains)))
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = skipFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve only fields we actually have (Spark may pass metadata cols)
    val names = full.fieldNames.toSet
    required = StructType(requiredSchema.fields.filter(f => names.contains(f.name)))
  }

  override def pushLimit(n: Int): Boolean = { limit = Some(n.toLong); true }
  override def pushOffset(n: Int): Boolean = { offset = n.toLong; true }

  override def build(): Scan =
    new ReadstatScan(ps, full, required, opts, limit, offset, skipFilters.toSeq)
}

final case class ReadstatInputPartition(
    path: String,
    format: String,
    rowStart: Long,
    rowCount: Long) extends InputPartition

class ReadstatScan(
    ps: Seq[String],
    full: StructType,
    required: StructType,
    opts: ReadstatOptions,
    limit: Option[Long],
    offset: Long,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"readstat ${ps.mkString(",")} cols=${required.fieldNames.mkString(",")} limit=$limit offset=$offset filters=${filters.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = scala.collection.mutable.ArrayBuffer[ReadstatInputPartition]()
    var skip = offset
    var remaining = limit.getOrElse(Long.MaxValue)
    ps.foreach { p =>
      if (remaining > 0) {
        val fmt = ReadstatOptions.detectFormat(p, opts.format)
        val mod = ReadstatFormats.forPath(p, opts)
        for ((start, count) <- mod.partitionRanges(p, opts) if remaining > 0) {
          // apply global offset/limit to this file's ranges
          val afterSkip = math.min(skip, count)
          val s = start + afterSkip
          val c0 = count - afterSkip
          skip -= afterSkip
          if (c0 > 0) {
            val c = math.min(c0, remaining)
            remaining -= c
            parts += ReadstatInputPartition(p, fmt, s, c)
          }
        }
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Per-file decode context (metadata, value labels, strL table) is built
    // once on the driver and BROADCAST — the moral equivalent of the
    // reference's Arc-shared SharedDecode (`src/stata/data.rs:21-48`).
    // Broadcast (not task serialization) so a large strL/GSO table ships to
    // each executor once instead of once per task (SURVEY.md §7.4 risk 4).
    val ctxs: Map[String, ReadstatFormats.FileContext] =
      ps.map(p => p -> ReadstatFormats.forPath(p, opts).fileContext(p, opts)).toMap
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(ctxs)
    new ReadstatReaderFactory(required, opts, bc, filters)
  }
}

class ReadstatReaderFactory(
    required: StructType,
    opts: ReadstatOptions,
    ctxs: org.apache.spark.broadcast.Broadcast[Map[String, ReadstatFormats.FileContext]],
    filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[ReadstatInputPartition]
    ReadstatFormats.forName(p.format).reader(p, ctxs.value(p.path), required, opts, filters)
  }
}

/** Shared IO helpers: Hadoop FileSystem so any DFS-backed path works. */
object ReadstatIO {
  def open(path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val hp = new HPath(path)
    val fs = FileSystem.get(hp.toUri, new Configuration())
    fs.open(hp)
  }
  def fileSize(path: String): Long = {
    val hp = new HPath(path)
    val fs = FileSystem.get(hp.toUri, new Configuration())
    fs.getFileStatus(hp).getLen
  }
}
