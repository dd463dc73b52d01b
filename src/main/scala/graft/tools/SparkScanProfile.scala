package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SparkScanProfile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = if (args.length > 1) args(1) else "1"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = spark.read.format("readstat")
        .option("maxPartitionBytes", (32L * 1024 * 1024).toString).load(path)
      val aggs = df.schema.fields.map(f =>
        if (f.dataType == org.apache.spark.sql.types.StringType) sum(length(col(f.name)))
        else sum(col(f.name)))
      df.agg(aggs.head, aggs.tail: _*).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = new java.io.File(path).length() / 1e6
      println(f"round $round cores=$cores: $sec%.2f s = ${mb / sec}%.0f MB/s wall")
    }
    spark.stop()
  }
}
