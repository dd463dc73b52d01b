package graft.sources.readstat

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Structured Streaming file source for readstat formats (SURVEY.md §2.9):
  * `spark.readStream.format("readstat").load(dir)` watches a directory and
  * emits each newly arrived `.dta`/`.sav`/`.sas7bdat` file as part of the
  * next micro-batch, reusing the batch planner's row-range partitioning per
  * file.
  *
  * Offsets are indices into the discovery order (files sorted by
  * modification time then name at each poll, appended once). The discovery
  * log lives in driver memory — a restarted query re-reads from the
  * beginning of the directory, the same at-least-once contract as a fresh
  * start; a durable file-log (as Spark's own FileStreamSource keeps) would
  * be the production hardening step.
  *
  * Arrival contract (same as Spark's file sources): files must appear in
  * the watched directory ATOMICALLY (write elsewhere, then rename in) — a
  * file caught mid-write fails its metadata parse.
  */
class ReadstatMicroBatchStream(
    dir: String,
    schema: StructType,
    opts: ReadstatOptions) extends MicroBatchStream {

  private case class FilesOffset(n: Int) extends Offset {
    override def json(): String = n.toString
  }

  // discovery order: stable, append-only
  private val discovered = mutable.LinkedHashSet[String]()

  private def poll(): Unit = {
    val hp = new HPath(dir)
    val fs = hp.getFileSystem(ReadstatIO.sessionConf)
    if (!fs.exists(hp)) return
    val status =
      if (fs.getFileStatus(hp).isDirectory) fs.listStatus(hp).toSeq
      else Seq(fs.getFileStatus(hp))
    val files = status
      .filter(st => st.isFile && hasKnownExtension(st.getPath.getName))
      .sortBy(st => (st.getModificationTime, st.getPath.toString))
      .map(_.getPath.toString)
    files.foreach(discovered += _)
  }

  private def hasKnownExtension(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".dta") || n.endsWith(".sav") || n.endsWith(".zsav") ||
      n.endsWith(".sas7bdat")
  }

  override def initialOffset(): Offset = FilesOffset(0)

  override def latestOffset(): Offset = {
    poll()
    FilesOffset(discovered.size)
  }

  override def deserializeOffset(json: String): Offset = FilesOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FilesOffset].n
    val e = end.asInstanceOf[FilesOffset].n
    val batchFiles = discovered.toSeq.slice(s, e)
    batchFiles.flatMap { p =>
      val fmt = ReadstatOptions.detectFormat(p, opts.format)
      val mod = ReadstatFormats.forName(fmt)
      mod.partitionRanges(p, opts).collect {
        case (rs, rc) if rc > 0 => ReadstatInputPartition(p, fmt, rs, rc)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // decode contexts for every discovered file (tasks only reference the
    // current batch's subset)
    val ctxs: Map[String, ReadstatFormats.FileContext] =
      discovered.toSeq.map(p =>
        p -> ReadstatFormats.forPath(p, opts).fileContext(p, opts)).toMap
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val bc = sc.broadcast(ctxs)
    val bcConf = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    new ReadstatReaderFactory(schema, schema, opts, bc, bcConf, Seq.empty)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
