package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** `df.writeStream.format("readstat")` — the streaming sink (r11):
  * append-only epoch-scoped part containers in a directory, assembled on
  * the executor by the directory-write machinery, readable back by the
  * multi-file batch load while the stream runs. Deterministic
  * `part-e<epoch>-<pid>` names make epoch replays overwrite instead of
  * duplicate.
  */
class ReadstatStreamSinkSpec extends SparkSpec {

  final case class Rec(x: Double, s: String)

  test("two epochs land as part containers and read back exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val input = MemoryStream[Rec]
    val q = input.toDF().writeStream
      .format("readstat").option("format", "dta")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start(dir)
    try {
      input.addData((0 until 100).map(i => Rec(i.toDouble, s"r$i")): _*)
      q.processAllAvailable()
      input.addData((100 until 250).map(i => Rec(i.toDouble, s"r$i")): _*)
      q.processAllAvailable()

      // the file set is epoch-scoped parts (and nothing else)
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".dta")).map(_.getName).sorted
      assert(parts.nonEmpty && parts.forall(_.startsWith("part-e")),
        s"epoch-scoped part names, got: ${parts.mkString(",")}")
      assert(parts.map(_.take("part-e000000".length)).distinct.length >= 2,
        s"parts from at least two epochs, got: ${parts.mkString(",")}")

      // the multi-file load reads the growing directory back exactly
      val back = spark.read.format("readstat").load(dir)
      val got = back.select("x", "s").collect()
        .map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
      assert(got.length === 250)
      assert(got.toSeq === (0 until 250).map(i => (i.toDouble, s"r$i")))
    } finally q.stop()
  }

  test("sav epochs round trip too (format option drives the container)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = Files.createTempDirectory("graft_stream_sink_sav").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt2").toString
    val input = MemoryStream[Rec]
    val q = input.toDF().writeStream
      .format("readstat").option("format", "sav")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      input.addData(Rec(1.5, "a"), Rec(2.5, "b"))
      q.processAllAvailable()
      val back = spark.read.format("readstat").load(dir)
      assert(back.select(sum("x")).collect().head.getDouble(0) === 4.0)
      assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".sav")))
    } finally q.stop()
  }

  test("single-container target is a named error") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val ckpt = Files.createTempDirectory("graft_sink_ckpt3").toString
    val input = MemoryStream[Rec]
    val target = Files.createTempDirectory("graft_sink_bad").resolve("out.dta").toString
    val e = intercept[Exception] {
      val q = input.toDF().writeStream
        .format("readstat").option("format", "dta")
        .option("checkpointLocation", ckpt)
        .start(target)
      try { input.addData(Rec(1.0, "a")); q.processAllAvailable() }
      finally q.stop()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("single container") || msg.contains("directory"),
      s"error must name the directory contract, got: $e")
  }

  test("complete output mode is rejected as append-only") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val ckpt = Files.createTempDirectory("graft_sink_ckpt4").toString
    val dir = Files.createTempDirectory("graft_sink_complete").toString
    val input = MemoryStream[Rec]
    val e = intercept[Exception] {
      val q = input.toDF().groupBy("s").agg(sum("x").as("x"))
        .writeStream.format("readstat").option("format", "dta")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .start(dir)
      try { input.addData(Rec(1.0, "a")); q.processAllAvailable() }
      finally q.stop()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("append"),
      s"error must state the append-only contract, got: $e")
  }
}
