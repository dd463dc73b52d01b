package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan/wall diagnostic for the q62 window-to-window swings:
  * runs the registered q62 against the 10x smoke corpus twice in one JVM
  * (cold codegen vs warm) and prints the formatted physical plan, so the
  * adjudication can name the stage instead of guessing from task medians.
  */
object DebugQ62 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64 << 10).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (1L << 20).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", (256 << 10).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_scale")
    val df = graft.SparkEntry.queries("q62_embedding_clusters")(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df2 = graft.SparkEntry.queries("q62_embedding_clusters")(spark, dir)
      val n = df2.count()
      System.err.println(f"[debugq62] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
