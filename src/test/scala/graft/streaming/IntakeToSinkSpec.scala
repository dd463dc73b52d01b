package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The full r11 streaming story in one pipe: documents arrive →
  * quality-gated, cross-batch fingerprint-deduped ([[DocStreams.intake]])
  * → land DURABLY as epoch-scoped readstat part containers (the streaming
  * sink) → a batch reader follows the directory with the ordinary
  * multi-file load. Every stage is the already-spec-pinned unit; this
  * spec pins the COMPOSITION — gates and sink share one streaming query,
  * state carries across micro-batches, and what the lake reader sees is
  * exactly the admitted set.
  */
class IntakeToSinkSpec extends SparkSpec {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long, ingest_ts: Timestamp)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val goodText = Array.fill(80)("data").mkString(" ")

  test("intake gates -> readstat sink -> batch read: the admitted set lands, durably") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = Files.createTempDirectory("graft_intake_sink").toString
    val ckpt = Files.createTempDirectory("graft_intake_ckpt").toString
    val input = MemoryStream[Doc]
    val q = DocStreams.intake(input.toDF())
      .select("doc_id", "source", "n_chars")
      .writeStream.format("readstat").option("format", "dta")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dir)
    try {
      input.addData(
        Doc(1, goodText, "en", "src0", goodText.length, ts("2024-01-01 10:00:00")),
        Doc(2, goodText + "!!!", "en", "src1", goodText.length + 3, ts("2024-01-01 10:01:00")),
        Doc(3, "tiny", "en", "src0", 4, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      input.addData(
        // cross-batch duplicate of doc 1 (state must persist) + one fresh
        Doc(4, goodText, "en", "src2", goodText.length, ts("2024-01-01 10:10:00")),
        Doc(5, goodText + " extra unique tail of words", "en", "src3",
          goodText.length + 27, ts("2024-01-01 10:11:00")))
      q.processAllAvailable()

      // the lake reader sees exactly the admitted set: 1 (first of its
      // fingerprint), 5 (unique) — 2 is a same-fingerprint dup, 3 fails
      // quality, 4 is the cross-batch dup
      val back = spark.read.format("readstat").load(dir)
      val ids = back.select("doc_id").collect().map(_.getDouble(0).toLong).sorted
      assert(ids.toSeq === Seq(1L, 5L), s"admitted set, got ${ids.mkString(",")}")
      // epoch-scoped parts from both batches are on disk
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".dta")).map(_.getName).sorted
      assert(parts.forall(_.startsWith("part-e")))
      assert(parts.map(_.take("part-e000000".length)).distinct.length >= 2,
        s"parts from both epochs, got: ${parts.mkString(",")}")
    } finally q.stop()
  }

  test("compaction runs against the LIVE intake: readers never skip or double-count") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = Files.createTempDirectory("graft_intake_compact").toString
    val ckpt = Files.createTempDirectory("graft_intake_compact_ckpt").toString
    val input = MemoryStream[Doc]
    val q = DocStreams.intake(input.toDF())
      .select("doc_id", "source", "n_chars")
      .writeStream.format("readstat").option("format", "dta")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dir)
    try {
      def doc(i: Long, minute: Int) = Doc(i, goodText + s" unique tail $i", "en",
        s"src$i", goodText.length + 14, ts(f"2024-01-01 10:$minute%02d:00"))
      // three epochs of unique (all-admitted) docs
      for (batch <- 0 until 3) {
        input.addData((batch * 10 until batch * 10 + 5).map(i => doc(i, batch)): _*)
        q.processAllAvailable()
      }
      val expected = (0 until 5) ++ (10 until 15) ++ (20 until 25)

      // the maintenance job runs while the stream is live (keep=1 protects
      // the newest epoch from a replay race)
      val r = graft.sources.readstat.Compaction.compact(spark, dir, keep = 1)
      assert(r.isDefined, "three epochs must fold")
      def readIds() = spark.read.format("readstat").load(dir)
        .select("doc_id").collect().map(_.getDouble(0).toLong).sorted.toSeq
      assert(readIds() === expected.map(_.toLong), "exactly-once after the swap")

      // the stream keeps appending AFTER compaction; the reader sees the
      // union of the compact set, surviving epoch parts, and new epochs
      input.addData((30 until 35).map(i => doc(i, 30)): _*)
      q.processAllAvailable()
      assert(readIds() === (expected ++ (30 until 35)).map(_.toLong),
        "post-compaction epochs land and read alongside the compact set")
      val names = new java.io.File(dir).listFiles().map(_.getName)
      assert(names.exists(_.matches("""compact-e\d+-e\d+\.done""")))
      assert(names.exists(_.startsWith("part-e")), "newer epochs stay as parts")
    } finally q.stop()
  }
}
