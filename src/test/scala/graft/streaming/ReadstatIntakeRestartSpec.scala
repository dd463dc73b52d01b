package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end continuous ingest (r8 verdict #5): the REAL file source
  * (`readStream.format("readstat")`, ReadstatMicroBatch) composed with
  * `DocStreams.intake`, restarted from a checkpoint — the 100 TB
  * continuous-intake story is only real if BOTH durable logs survive the
  * restart together: the source's file log (no re-emission of committed
  * files) and the dedup operator's state store (a fingerprint admitted
  * before the restart still blocks duplicates after it). DocStreamsSpec
  * pins the intake semantics on MemoryStream; this spec pins the same
  * pipeline over arriving .dta files, in the style of
  * ReadstatStreamSourceSpec's restart test.
  */
class ReadstatIntakeRestartSpec extends SparkSpec {

  // 80 × 4-char tokens: score 0.4, admissible (same fixture as DocStreamsSpec)
  private val goodText = Array.fill(80)("data").mkString(" ")
  private val uniqueText = goodText + " extra unique tail of words"
  private val shortText = "too short" // score ~0.01, rejected

  /** documents-schema rows + an epoch-seconds ingest stamp, written as a
    * .dta file and moved into the watched dir atomically (the same arrival
    * contract as ReadstatStreamSourceSpec).
    */
  private def writeDocsDta(dir: java.nio.file.Path, name: String,
      rows: Seq[(Double, String, Double)]): Unit = {
    val sp = spark
    import sp.implicits._
    val df = rows.toDF("doc_id", "text", "ingest_sec")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("stream/src0"))
      .withColumn("n_chars", length(col("text")).cast("double"))
      .select("doc_id", "text", "lang", "source", "n_chars", "ingest_sec")
    val tmp = Files.createTempDirectory("graft_intake_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("file-source intake restart: dedup state AND file log survive the checkpoint") {
    val dir = Files.createTempDirectory("graft_intake_in")
    val ckpt = Files.createTempDirectory("graft_intake_ckpt").toString
    val outDir = Files.createTempDirectory("graft_intake_out").toString

    // 2024-01-01 10:00:00 UTC; later arrivals stay inside the 1 h watermark
    val t0 = 1704103200.0

    def start() = {
      val stream = spark.readStream.format("readstat").load(dir.toString)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars").cast("long").as("n_chars"),
          // the ingest edge stamps event time from the carried epoch seconds
          col("ingest_sec").cast("timestamp").as("ingest_ts"))
      DocStreams.intake(stream).writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    writeDocsDta(dir, "b1.dta", Seq((1.0, goodText, t0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L), "doc 1 admitted before restart")

    // new file arrives while the query is DOWN: doc 2 duplicates doc 1's
    // fingerprint (must be dropped — only if the dedup state store came
    // back), doc 3 is unique and admissible, doc 4 fails the quality gate
    writeDocsDta(dir, "b2.dta", Seq(
      (2.0, goodText, t0 + 300),
      (3.0, uniqueText, t0 + 360),
      (4.0, shortText, t0 + 420)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val ids = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // 1 re-emitted → file log lost; 2 admitted → dedup state lost;
    // 4 admitted → gate lost
    assert(ids === Seq(1L, 3L),
      s"expected exactly docs 1 and 3 after restart, got $ids")
  }
}
