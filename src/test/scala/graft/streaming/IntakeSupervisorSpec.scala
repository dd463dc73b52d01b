package graft.streaming

import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Widen-restart supervision (r11 close-out candidate (c)): the admission
  * gate refuses arrivals that need a wider schema (Spark fixes a stream's
  * output schema at start) and leaves a restart-to-re-merge hint; the
  * supervisor automates that restart. The spec drives the REAL loop:
  * intake stream → wider arrival quarantined → supervisor detects a
  * re-mergeable refusal by re-probe → stop/rebuild → the arrival's rows
  * flow under the widened schema, while a corrupt upload never triggers
  * a restart.
  */
class IntakeSupervisorSpec extends SparkSpec {

  private def writeDtaInt(dir: java.nio.file.Path, name: String, from: Int, n: Int): Unit = {
    val df = spark.range(from, from + n).select(
      col("id").cast("int").as("x"), concat(lit("r"), col("id") % 7).as("s"))
    val tmp = Files.createTempDirectory("graft_sup_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeDtaDouble(dir: java.nio.file.Path, name: String, from: Int, n: Int): Unit = {
    val df = spark.range(from, from + n).select(
      (col("id") + lit(0.5)).cast("double").as("x"),
      concat(lit("r"), col("id") % 7).as("s"))
    val tmp = Files.createTempDirectory("graft_sup_stage").resolve(name)
    graft.sources.readstat.stata.DtaWriter.write(df, tmp.toString)
    Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("jsonField round-trips the quarantine record's escaping") {
    val j = """{"path": "/tmp/a \"b\"\\c.dta", "stage": "plan", "error": "x"}"""
    assert(IntakeSupervisor.jsonField(j, "path") === Some("""/tmp/a "b"\c.dta"""))
    assert(IntakeSupervisor.jsonField(j, "stage") === Some("plan"))
    assert(IntakeSupervisor.jsonField(j, "nope") === None)
  }

  test("supervisor closes the widen loop; corrupt uploads never restart it") {
    val src = Files.createTempDirectory("graft_sup_src")
    val badDir = Files.createTempDirectory("graft_sup_bad").toString
    val out = Files.createTempDirectory("graft_sup_out").toString
    val ckpt = Files.createTempDirectory("graft_sup_ckpt").toString
    writeDtaInt(src, "a_narrow.dta", 0, 20)

    def readOut(): Seq[Double] = Try {
      spark.read.format("readstat").option("mergeSchema", "true").load(out)
        .select(col("x").cast("double")).collect().map(_.getDouble(0)).toSeq
    }.getOrElse(Seq.empty)

    def build() = {
      val df = spark.readStream.format("readstat")
        .option("mergeSchema", "true")
        .option("mode", "PERMISSIVE").option("badFilesPath", badDir)
        .load(src.toString)
      val q = df.writeStream.format("readstat").option("format", "dta")
        .option("checkpointLocation", ckpt).outputMode("append")
        .start(out)
      (q, df.schema)
    }

    val total = 30
    @volatile var restarts = -1
    val t = new Thread(() => {
      restarts = IntakeSupervisor.supervise(spark, badDir, build _,
        stop = () => readOut().size >= total, pollMs = 100)
    })
    t.start()
    try {
      // initial narrow file flows under the int schema
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (readOut().size < 20 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(readOut().size === 20, "initial rows must flow before the drift")

      // a corrupt upload: quarantined, must NOT trigger a restart
      Files.write(src.resolve("b_garbage.dta"), Array.fill[Byte](2048)(0x5A))
      Thread.sleep(600) // several poll cycles
      assert(restarts === -1, "corrupt upload must not restart the stream")

      // the WIDER arrival: x double — refused by the running query,
      // detected as re-mergeable, restart admits it
      writeDtaDouble(src, "c_wide.dta", 20, 10)
      t.join(60000)
      assert(!t.isAlive, "supervisor must converge")
    } finally {
      if (t.isAlive) { t.interrupt(); t.join(10000) }
    }
    assert(restarts === 1, s"exactly one widen restart, got $restarts")
    val xs = readOut().sorted
    assert(xs.size === total)
    assert(xs.take(20) === (0 until 20).map(_.toDouble))
    assert(xs.drop(20) === (20 until 30).map(_ + 0.5))
    // the widened read's schema is the merged one
    val sch = spark.read.format("readstat").option("mergeSchema", "true")
      .load(out).schema
    assert(sch("x").dataType === DoubleType, sch.treeString)
  }
}
