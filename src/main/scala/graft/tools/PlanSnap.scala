package graft.tools

import org.apache.spark.sql.SparkSession

/** Snapshot `explain("formatted")` for named queries into
  * `plans/<tag>/<query>_<suffix>.txt` — the per-round optimization
  * evidence files (r16 deliverable: plans/r16/<query>_before.txt /
  * _after.txt). Usage:
  *
  *   sbt "runMain graft.tools.PlanSnap r16 before q73_dedup_disposition ..."
  *
  * Runs at sf0.001 on local[4] like PlanDump — plan SHAPE (exchanges,
  * join strategies, pushdown) is scale-invariant for these queries; the
  * bench carries the timing evidence.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query...>")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      df.unpersist(blocking = false)
      spark.catalog.clearCache()
      println(s"[plansnap] wrote plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
