package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** df.write.format("readstat") end-to-end for dta / sav / sas7bdat. */
class WritePathSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_w").resolve(name).toString

  private def roundTrip(ext: String): Unit = {
    val df = spark.range(500).select(
      col("id").cast("double").as("x"),
      concat(lit("name"), col("id") % 13).as("s"))
    val path = tmp(s"out.$ext")
    df.coalesce(1).write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() === 500)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) === (499.0 * 500 / 2))
    assert(back.select("s").distinct().count() === 13)
  }

  test("write.format(readstat).save -> .dta") { roundTrip("dta") }
  test("write.format(readstat).save -> .sav") { roundTrip("sav") }
  test("write.format(readstat).save -> .sas7bdat") { roundTrip("sas7bdat") }

  test("multi-partition write is rejected with guidance") {
    val df = spark.range(100).repartition(4).select(col("id").cast("double").as("x"))
    val path = tmp("multi.dta")
    val e = intercept[Exception] {
      df.write.format("readstat").mode("overwrite").save(path)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("coalesce(1)")))
  }

  test("multi-file load unions partitions across files") {
    val a = spark.range(100).select(col("id").cast("double").as("x"))
    val b = spark.range(100, 250).select(col("id").cast("double").as("x"))
    val p1 = tmp("a.dta"); val p2 = tmp("b.dta")
    a.coalesce(1).write.format("readstat").mode("overwrite").save(p1)
    b.coalesce(1).write.format("readstat").mode("overwrite").save(p2)
    val both = spark.read.format("readstat").load(p1, p2)
    assert(both.count() === 250)
    assert(both.agg(sum("x")).collect()(0).getDouble(0) === (249.0 * 250 / 2))
  }
}
