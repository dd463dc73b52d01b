package graft.tools
import java.util.concurrent.Executors
import graft.sources.readstat.{ReadstatFormats, ReadstatInputPartition, ReadstatOptions}
object ParScanProfile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val threads = if (args.length > 1) args(1).toInt else 8
    val fmt = ReadstatOptions.detectFormat(path, None)
    val mod = ReadstatFormats.forName(fmt)
    val m = new java.util.HashMap[String, String]()
    m.put("maxPartitionBytes", (32L * 1024 * 1024).toString)
    val opts = ReadstatOptions.from(m)
    val schema = mod.schema(path, opts)
    val ctx = mod.fileContext(path, opts)
    val ranges = mod.partitionRanges(path, opts)
    println(s"partitions=${ranges.length}")
    for (round <- 1 to 3) {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = ranges.map { case (s, c) => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          val r = mod.reader(ReadstatInputPartition(path, fmt, s, c), ctx, schema, opts)
          var n = 0L
          while (r.next()) { r.get(); n += 1 }
          r.close(); n
        }
      })}
      val n = futs.map(_.get()).sum
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = new java.io.File(path).length() / 1e6
      println(f"round $round threads=$threads: $n rows $sec%.2f s = ${mb / sec}%.0f MB/s wall = ${mb / sec / threads}%.0f MB/s/core")
    }
  }
}
