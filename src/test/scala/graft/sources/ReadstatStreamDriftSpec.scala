package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming-source admission gate (r11): every newly arrived file's
  * schema is probed and pinned BEFORE its rows can enter a micro-batch.
  * A corrupt upload used to kill a 24/7 intake query; a schema-drifted
  * upload was worse — per-file column plans under the stream's pinned
  * schema could decode wrongly-typed rows. Now FAILFAST turns both into
  * a NAMED query failure at the offending file, and PERMISSIVE
  * quarantines the file (skip + report) while the stream keeps running.
  */
class ReadstatStreamDriftSpec extends SparkSpec {

  private def writeDta(dir: java.nio.file.Path, name: String, from: Int, n: Int): Unit = {
    val df = spark.range(from, from + n).select(
      col("id").cast("double").as("x"),
      concat(lit("r"), col("id") % 7).as("s"))
    val tmp = Files.createTempDirectory("graft_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeDrifted(dir: java.nio.file.Path, name: String): Unit = {
    // same column names, drifted type (x becomes a string) + added column
    val df = spark.range(0, 10).select(
      concat(lit("not_a_double_"), col("id")).as("x"),
      concat(lit("r"), col("id") % 7).as("s"),
      col("id").cast("double").as("extra"))
    val tmp = Files.createTempDirectory("graft_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("PERMISSIVE: corrupt and drifted arrivals quarantine, stream keeps flowing") {
    val dir = Files.createTempDirectory("graft_drift_perm")
    val badDir = Files.createTempDirectory("graft_drift_bad").toString
    writeDta(dir, "a_good1.dta", 0, 50)

    val q = spark.readStream.format("readstat")
      .option("mode", "PERMISSIVE").option("badFilesPath", badDir)
      .load(dir.toString)
      .writeStream.format("memory").queryName("rs_drift_perm")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rs_drift_perm").count() === 50)

      // a corrupt upload, a drifted upload, and another good one arrive
      Files.write(dir.resolve("b_garbage.dta"), Array.fill[Byte](2048)(0x5A))
      writeDrifted(dir, "c_drifted.dta")
      writeDta(dir, "d_good2.dta", 50, 30)
      q.processAllAvailable()

      val xs = spark.table("rs_drift_perm").select("x")
        .collect().map(_.getDouble(0)).sorted
      assert(xs.length === 80, "both good files' rows and nothing else")
      assert(xs.toSeq === (0 until 80).map(_.toDouble))

      val reports = new java.io.File(badDir).listFiles()
        .filter(_.getName.endsWith(".json"))
        .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
      assert(reports.contains("b_garbage.dta"), s"corrupt file reported, got: $reports")
      assert(reports.contains("c_drifted.dta"), s"drifted file reported, got: $reports")
    } finally q.stop()
  }

  test("FAILFAST: a drifted arrival fails the query with a named error") {
    val dir = Files.createTempDirectory("graft_drift_ff")
    writeDta(dir, "a_good1.dta", 0, 20)

    val q = spark.readStream.format("readstat").load(dir.toString)
      .writeStream.format("memory").queryName("rs_drift_ff")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rs_drift_ff").count() === 20)
      writeDrifted(dir, "b_drifted.dta")
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
      val msg = messages(e)
      assert(msg.contains("schema drift") && msg.contains("b_drifted.dta"),
        s"error must name the drift and the file, got: $msg")
    } finally q.stop()
  }
}
