package graft.tools

import graft.sources.readstat.{ReadstatFormats, ReadstatInputPartition, ReadstatOptions}

/** Debug aid: print schema + first N decoded rows of a readstat file through
  * the module-level reader (same decode path the DSv2 scan uses).
  */
object CorpusDump {
  /** ASCII-safe render: non-ASCII chars as \ uXXXX so console charset can't lie. */
  def esc(s: String): String =
    s.flatMap(c => if (c >= ' ' && c < 127) c.toString else f"\\u${c.toInt}%04x")

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val fmt = ReadstatOptions.detectFormat(path, None)
    val mod = ReadstatFormats.forName(fmt)
    val opts = ReadstatOptions.from(new java.util.HashMap[String, String]())
    val schema = mod.schema(path, opts)
    println(schema.treeString)
    val ctx = mod.fileContext(path, opts)
    val ranges = mod.partitionRanges(path, opts)
    val r = mod.reader(ReadstatInputPartition(path, fmt, ranges.head._1,
      math.min(n.toLong, ranges.head._2)), ctx, schema, opts)
    var i = 0
    while (r.next() && i < n) {
      val row = r.get()
      val cells = schema.fields.indices.map { j =>
        val v = row.get(j, schema.fields(j).dataType)
        s"${esc(schema.fields(j).name)}=${esc(String.valueOf(v))}"
      }
      println(cells.mkString(" | "))
      i += 1
    }
    r.close()
  }
}
