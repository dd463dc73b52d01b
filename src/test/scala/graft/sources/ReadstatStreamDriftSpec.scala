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

  test("mergeSchema: a narrower arrival (int x, missing column) widens in mid-stream") {
    val dir = Files.createTempDirectory("graft_drift_merge")
    writeDta(dir, "a_wide.dta", 0, 20) // x double, s string

    val q = spark.readStream.format("readstat")
      .option("mergeSchema", "true")
      .load(dir.toString)
      .writeStream.format("memory").queryName("rs_drift_merge")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rs_drift_merge").count() === 20)

      // the drifted-but-narrower monthly extract: x was written as an int
      // and the s column does not exist at all
      val df = spark.range(100, 110).select(col("id").cast("int").as("x"))
      val tmp = Files.createTempDirectory("graft_stage").resolve("b_narrow.dta")
      graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
      Files.move(tmp, dir.resolve("b_narrow.dta"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      q.processAllAvailable()

      val rows = spark.table("rs_drift_merge").select("x", "s").collect()
      assert(rows.length === 30, "the narrow file's rows must be ADMITTED")
      assert(rows.map(_.getDouble(0)).sorted.toSeq ===
        ((0 until 20) ++ (100 until 110)).map(_.toDouble),
        "int x widens into the declared double")
      val narrow = rows.filter(_.getDouble(0) >= 100.0)
      assert(narrow.forall(_.isNullAt(1)), "the missing column null-fills")
    } finally q.stop()
  }

  test("mergeSchema: a WIDER arrival still stops — output schemas are fixed mid-query") {
    val dir = Files.createTempDirectory("graft_drift_merge_ff")
    writeDta(dir, "a_good1.dta", 0, 10)

    val q = spark.readStream.format("readstat")
      .option("mergeSchema", "true")
      .load(dir.toString)
      .writeStream.format("memory").queryName("rs_drift_merge_ff")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rs_drift_merge_ff").count() === 10)
      writeDrifted(dir, "b_wider.dta") // x becomes a string + a NEW column
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
      val msg = messages(e)
      assert(msg.contains("b_wider.dta") && msg.contains("restart the stream"),
        s"error must name the file and the restart-to-re-merge path, got: $msg")
      assert(msg.contains("extra"), s"error must name the new column, got: $msg")
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
