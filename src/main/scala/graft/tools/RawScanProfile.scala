package graft.tools
import org.apache.spark.sql.SparkSession
object RawScanProfile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = if (args.length > 1) args(1) else "8"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = spark.read.format("readstat")
        .option("maxPartitionBytes", (32L * 1024 * 1024).toString).load(path)
      // consume raw InternalRows, no agg above the scan
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = new java.io.File(path).length() / 1e6
      println(f"round $round cores=$cores raw: $sec%.2f s = ${mb / sec}%.0f MB/s wall")
    }
    spark.stop()
  }
}
