package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.readstat.ReadstatScan
import graft.sources.readstat.stata.DtaWriter

/** SupportsRuntimeFiltering (r4): a broadcast-join build side prunes
  * readstat rows at EXECUTION time — the dim's key set isn't known at plan
  * time, so static pushdown can't do this. The runtime In-filter feeds the
  * decode-skip machinery, so the scan's output row count (and the bytes
  * decoded) drop to the matching rows.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def readstatScans(p: SparkPlan): Seq[BatchScanExec] =
    p.collect { case b: BatchScanExec if b.scan.isInstanceOf[ReadstatScan] => b }

  test("broadcast-join build side runtime-filters the readstat scan") {
    val factRows = 50000L
    val dir = Files.createTempDirectory("graft_rf")
    val factPath = dir.resolve("fact.dta").toString
    val dimPath = dir.resolve("dim.parquet").toString
    DtaWriter.write(spark.range(factRows).select(
      (col("id") % 1000).cast("int").as("k"),
      col("id").cast("double").as("x")), factPath)
    // dim with a selective predicate column (DPP requires one on the build side)
    spark.range(1000).select(
      col("id").cast("int").as("k"),
      when(col("id") < 3, 1).otherwise(0).as("flag"))
      .write.mode("overwrite").parquet(dimPath)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.read.format("readstat").load(factPath)
      val dim = spark.read.parquet(dimPath).filter(col("flag") === 1)
      val joined = fact.join(dim, "k")
      // metrics live on ONE query execution: run exactly this plan
      val qe = joined.queryExecution
      val planStr = qe.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no runtime filter planned on the readstat scan:\n$planStr")
      assert(qe.executedPlan.executeCollect().length === (3 * factRows / 1000).toInt)
      // the runtime filter reached the decoder: the readstat scan emitted
      // only the matching rows, not the whole fact table
      val scans = readstatScans(qe.executedPlan)
      assert(scans.nonEmpty)
      val installed = scans.map(_.scan.asInstanceOf[ReadstatScan].installedRuntimeFilters)
      val rowsOut = scans.map(_.metrics("numOutputRows").value).sum
      assert(rowsOut === 3 * factRows / 1000,
        s"scan emitted $rowsOut rows — runtime filter did not reach the decoder " +
          s"(installed=$installed)\n$planStr")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
