package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.spss.SavWriter

/** Writer→reader round trips over the sav path, compression 0 and 1. */
class SavRoundTripSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_sav").resolve(name).toString

  private val schema = StructType(Seq(
    StructField("num", DoubleType), StructField("s", StringType),
    StructField("d", DateType), StructField("ts", TimestampNTZType)))
  private val rows = Seq(
    Row(1.5, "hello", java.sql.Date.valueOf("2001-06-15"),
      java.time.LocalDateTime.parse("2001-06-15T12:34:56")),
    Row(null, null, null, null),
    Row(-273.25, "wörld", java.sql.Date.valueOf("1582-10-14"),
      java.time.LocalDateTime.parse("1970-01-01T00:00:00")),
    Row(42.0, "x", java.sql.Date.valueOf("2024-02-29"),
      java.time.LocalDateTime.parse("2024-02-29T23:59:59")))

  private def check(compress: Boolean): Unit = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp(s"all_$compress.sav")
    SavWriter.write(df, path, compress = compress)
    val back = spark.read.format("readstat").load(path)
    assert(back.schema("num").dataType === DoubleType)
    assert(back.schema("s").dataType === StringType)
    assert(back.schema("d").dataType === DateType)
    assert(back.schema("ts").dataType === TimestampNTZType)
    val got = back.collect().map(_.toSeq).toSeq
    assert(got === rows.map(_.toSeq))
  }

  test("uncompressed sav round trip (types, dates, datetimes, nulls)") { check(false) }
  test("bytecode-compressed sav round trip") { check(true) }

  test("bytecode small-int fast path encodes via bias codes") {
    import scala.jdk.CollectionConverters._
    val s2 = StructType(Seq(StructField("k", DoubleType)))
    val r2 = (-99 to 151).map(i => Row(i.toDouble)) :+ Row(1e10) :+ Row(null)
    val df = spark.createDataFrame(r2.asJava, s2)
    val path = tmp("bias.sav")
    SavWriter.write(df, path, compress = true)
    val back = spark.read.format("readstat").load(path)
    assert(back.collect().map(r => Option(r.get(0))).toSeq === r2.map(r => Option(r.get(0))))
  }

  test("numeric value labels decode to strings") {
    import scala.jdk.CollectionConverters._
    val s2 = StructType(Seq(StructField("status", DoubleType)))
    val df = spark.createDataFrame(Seq(Row(1.0), Row(2.0), Row(9.0), Row(null)).asJava, s2)
    val path = tmp("labels.sav")
    SavWriter.write(df, path, valueLabels = Map("status" -> Map(1.0 -> "Yes", 2.0 -> "No")))
    val back = spark.read.format("readstat").load(path)
    assert(back.schema("status").dataType === StringType)
    assert(back.collect().map(_.getString(0)).toSeq === Seq("Yes", "No", "9", null))
  }

  test("long variable names survive the 8-char short-name mapping") {
    import scala.jdk.CollectionConverters._
    val s2 = StructType(Seq(
      StructField("a_very_long_column_name", DoubleType),
      StructField("another_long_name", StringType)))
    val df = spark.createDataFrame(Seq(Row(7.0, "z")).asJava, s2)
    val path = tmp("longnames.sav")
    SavWriter.write(df, path)
    val back = spark.read.format("readstat").load(path)
    assert(back.columns.toSeq === Seq("a_very_long_column_name", "another_long_name"))
  }

  test("multi-partition uncompressed read; single partition when compressed") {
    val n = 20000
    val df = spark.range(n.toLong).select(col("id").cast("double").as("x"))
    val p0 = tmp("u.sav"); val p1 = tmp("c.sav")
    SavWriter.write(df, p0, compress = false)
    SavWriter.write(df, p1, compress = true)
    val u = spark.read.format("readstat")
      .option("maxPartitionBytes", "16384").option("minRowsPerPartition", "1000").load(p0)
    assert(u.rdd.getNumPartitions > 1)
    assert(u.agg(sum("x")).collect()(0).getDouble(0) === (n.toLong * (n - 1) / 2).toDouble)
    val c = spark.read.format("readstat")
      .option("maxPartitionBytes", "16384").load(p1)
    assert(c.rdd.getNumPartitions === 1)
    assert(c.count() === n)
  }
}
