package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The on-disk inverted-file layout q70's scaladoc claims for 100 TB:
  * writing the PQ code table `partitionBy(c_label)` makes a probed search
  * prune UNPROBED cells at the file level — the scan itself, not a
  * downstream join, discards them. This spec pins the whole chain:
  * partition filter present in the scan plan, and the scan's file metric
  * showing only the probed cells' files were read.
  */
class IvfLayoutSpec extends SparkSpec {

  test("code table written partitionBy(c_label) prunes unprobed cells at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_layout").toFile
    val dir = new java.io.File(tmp, "codes")
    try {
      val path = dir.getAbsolutePath
      // synthetic inverted file with PQ codes: 10 cells × 50 vectors × 8
      // subspaces, codes deterministic from (cid, subspace)
      val codes = spark.range(500).select(
        (col("id") % 10).cast("int").as("c_label"), col("id").as("cid"))
        .select(col("c_label"), col("cid"),
          explode(expr("sequence(0, 7)")).as("subspace"))
        .withColumn("code", pmod(hash(col("cid"), col("subspace")), lit(10)).cast("int"))
      codes.write.partitionBy("c_label").parquet(path)

      val probed = Seq(3, 7)
      val scan = spark.read.parquet(path)
        .filter(col("c_label").isin(probed.map(Int.box): _*))
      val rows = scan.collect()
      assert(rows.length === 2 * 50 * 8, s"${rows.length} rows")
      assert(rows.forall(r => probed.contains(r.getAs[Int]("c_label"))))

      val scanExecs = scan.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scanExecs.nonEmpty, "no FileSourceScanExec in plan")
      val f = scanExecs.head
      // the probe predicate must be a PARTITION filter (file-level prune),
      // not a data filter evaluated after reading every cell
      val pf = f.metadata.getOrElse("PartitionFilters", "")
      assert(pf.contains("c_label"), s"probe not a partition filter: $pf")
      // and the executed scan's own metric proves it: files read < files
      // present (10 cell directories, only 2 probed)
      val readFiles = f.metrics("numFiles").value
      val allFiles = spark.read.parquet(path).inputFiles.length
      assert(readFiles > 0 && readFiles < allFiles,
        s"scan read $readFiles of $allFiles files - no partition pruning")
      // the layout really is one directory per coarse cell
      val cellDirs = dir.listFiles().count(_.getName.startsWith("c_label="))
      assert(cellDirs === 10, s"$cellDirs cell directories")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }
}
