package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the measured-marginal background-mass table B(b)/n
  * for a corpus dir, plus the auto-selected band width — the numbers
  * behind [[graft.operators.SimilarityOps.autoBandBits]].
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val b = graft.operators.SimilarityOps.autoBandBitsAt(spark, d)
      println(s"[bandprobe] $d auto_b=$b")
    }
    spark.stop()
  }
}
