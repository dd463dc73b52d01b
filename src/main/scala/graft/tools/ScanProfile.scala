package graft.tools
import graft.sources.readstat.{ReadstatFormats, ReadstatInputPartition, ReadstatOptions}
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cols = if (args.length > 1) Some(args(1).split(",").toSeq) else None
    val fmt = ReadstatOptions.detectFormat(path, None)
    val mod = ReadstatFormats.forName(fmt)
    val opts = ReadstatOptions.from(new java.util.HashMap[String, String]())
    val full = mod.schema(path, opts)
    val schema = cols.map(cs => org.apache.spark.sql.types.StructType(
      cs.flatMap(c => full.fields.find(_.name == c)))).getOrElse(full)
    val ctx = mod.fileContext(path, opts)
    val ranges = mod.partitionRanges(path, opts)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var n = 0L
      for ((s, c) <- ranges) {
        val r = mod.reader(ReadstatInputPartition(path, fmt, s, c), ctx, schema, opts)
        while (r.next()) { r.get(); n += 1 }
        r.close()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = new java.io.File(path).length() / 1e6
      println(f"round $round: $n rows in $sec%.2f s = ${mb / sec}%.0f MB/s single-thread (cols=${schema.length})")
    }
  }
}
