package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `spark.readStream.format("readstat")` — the streaming file source
  * (SURVEY.md §2.9 S5-ext): each newly arrived file lands in the next
  * micro-batch. Also covers the batch-side directory load that the same
  * expansion enables.
  */
class ReadstatStreamSourceSpec extends SparkSpec {

  private def writeDta(dir: java.nio.file.Path, name: String, from: Int, n: Int): Unit = {
    val df = spark.range(from, from + n).select(
      col("id").cast("double").as("x"),
      concat(lit("r"), col("id") % 7).as("s"))
    // write outside the watched dir, then move in atomically — the same
    // arrival contract as Spark's own file sources
    val tmp = Files.createTempDirectory("graft_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("streaming source picks up files as they arrive") {
    val dir = Files.createTempDirectory("graft_stream")
    writeDta(dir, "part1.dta", 0, 100)

    val stream = spark.readStream.format("readstat").load(dir.toString)
    assert(stream.isStreaming)
    val q = stream.groupBy().agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .writeStream.format("memory").queryName("rs_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("rs_stream").collect()(0)
      assert(r1.getLong(0) == 100)
      assert(r1.getDouble(1) == 4950.0)

      writeDta(dir, "part2.dta", 100, 150)
      q.processAllAvailable()
      val r2 = spark.table("rs_stream").collect()(0)
      assert(r2.getLong(0) == 250)
      assert(r2.getDouble(1) == (0 until 250).map(_.toDouble).sum)
    } finally q.stop()
  }

  test("restart from checkpoint re-emits nothing (durable file log)") {
    val dir = Files.createTempDirectory("graft_stream_rs")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    writeDta(dir, "p1.dta", 0, 80)

    val outDir = Files.createTempDirectory("graft_stream_out").toString
    def start() = spark.readStream.format("readstat").load(dir.toString)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() === 80)
    // the file log must be durable under the checkpoint
    assert(new java.io.File(ckpt + "/sources/0/readstat-files.log").isFile ||
      new java.io.File(ckpt, "readstat-files.log").isFile)

    // restart from the same checkpoint: p1 is committed, only p2 may emit
    writeDta(dir, "p2.dta", 80, 50)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(outDir).collect()
    assert(rows.length === 130, "restart must not re-emit committed files")
    assert(rows.map(_.getDouble(0)).sum === (0 until 130).map(_.toDouble).sum)
  }

  test("maxFilesPerTrigger admits files across separate micro-batches") {
    val dir = Files.createTempDirectory("graft_stream_mft")
    writeDta(dir, "f1.dta", 0, 10)
    writeDta(dir, "f2.dta", 10, 10)
    writeDta(dir, "f3.dta", 20, 10)
    val q = spark.readStream.format("readstat")
      .option("maxFilesPerTrigger", "1").load(dir.toString)
      .writeStream.format("memory").queryName("rs_mft")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rs_mft").count() === 30)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected >=3 micro-batches of 1 file, got $batches")
    } finally q.stop()
  }

  test("batch load of a directory reads every contained file") {
    val dir = Files.createTempDirectory("graft_dirload")
    writeDta(dir, "a.dta", 0, 40)
    writeDta(dir, "b.dta", 40, 60)
    val df = spark.read.format("readstat").load(dir.toString)
    assert(df.count() == 100)
    assert(df.agg(sum("x")).collect()(0).getDouble(0) == 4950.0)
  }
}
