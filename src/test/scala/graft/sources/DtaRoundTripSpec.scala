package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.stata.DtaWriter

/** Writer→reader round trips over the dta path (FIXTURES.md §3, §5). */
class DtaRoundTripSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_dta").resolve(name).toString

  test("all-types round trip: byte/short/int/float/double/string + nulls") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("b", ByteType), StructField("i", ShortType),
      StructField("l", IntegerType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType)))
    val rows = Seq(
      Row(1.toByte, 100.toShort, 100000, 1.5f, 2.25, "hello"),
      Row(null, null, null, null, null, null),
      Row((-5).toByte, (-300).toShort, -70000, -0.75f, 1e300, "wörld"),
      Row(0.toByte, 0.toShort, 0, 0f, 0.0, ""))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("alltypes.dta")
    DtaWriter.write(df, path)

    val back = spark.read.format("readstat").load(path)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(_.toSeq).toSeq
    // empty string reads back as null (missingStringAsNull default, P6)
    val expected = rows.map(_.toSeq).map(s => s.updated(5, if (s(5) == "") null else s(5)))
    assert(got === expected)
  }

  test("date and datetime round trip via %td / %tc formats") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("ts", TimestampNTZType)))
    val rows = Seq(
      Row(java.sql.Date.valueOf("1999-12-31"),
        java.time.LocalDateTime.parse("1999-12-31T23:59:59")),
      Row(java.sql.Date.valueOf("1960-01-01"),
        java.time.LocalDateTime.parse("1960-01-01T00:00:00")),
      Row(null, null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("dates.dta")
    DtaWriter.write(df, path)

    val back = spark.read.format("readstat").load(path)
    assert(back.schema("d").dataType === DateType)
    assert(back.schema("ts").dataType === TimestampNTZType)
    assert(back.collect().map(_.toSeq).toSeq === rows.map(_.toSeq))
  }

  test("value labels decode to strings with numeric fallback") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("status", IntegerType)))
    val rows = Seq(Row(1), Row(2), Row(7), Row(null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("labels.dta")
    DtaWriter.write(df, path, valueLabels = Map("status" -> Map(1 -> "Active", 2 -> "Inactive")))

    val back = spark.read.format("readstat").load(path)
    assert(back.schema("status").dataType === StringType)
    assert(back.collect().map(_.getString(0)).toSeq === Seq("Active", "Inactive", "7", null))

    // and raw numerics when disabled
    val raw = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "false").load(path)
    assert(raw.schema("status").dataType === IntegerType)
    assert(raw.collect().map(_.get(0)).toSeq === Seq(1, 2, 7, null))
  }

  test("strL round trip for wide strings") {
    import scala.jdk.CollectionConverters._
    val big = "x" * 3000
    val schema = StructType(Seq(StructField("t", StringType)))
    val rows = Seq(Row(big), Row("short-but-strl-column"), Row(null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("strl.dta")
    DtaWriter.write(df, path)
    val back = spark.read.format("readstat").load(path)
    assert(back.collect().map(_.getString(0)).toSeq === Seq(big, "short-but-strl-column", null))
  }

  test("strL GSO table over maxStrlBytes fails with a named, size-reporting error") {
    // SURVEY §7.4 risk 4: the GSO table is driver-parsed and broadcast, so
    // a multi-GB strL section must fail loudly (naming the size and the
    // option that raises the cap), not silently pressure the driver
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("t", StringType)))
    val rows = (0 until 64).map(i => Row(s"row$i:" + ("y" * 4000)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("strl_big.dta")
    DtaWriter.write(df, path)

    // count() alone is answered from metadata (COUNT(*) pushdown) — force
    // actual column decode so the GSO table loads
    val e = intercept[Exception] {
      spark.read.format("readstat").option("maxStrlBytes", "10000")
        .load(path).agg(sum(length(col("t")))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("maxStrlBytes=10000"), s"unexpected error: $msgs")
    assert(msgs.contains("maxStrlBytes"), s"error must name the option: $msgs")

    // default cap (1 GiB) admits it
    assert(spark.read.format("readstat").load(path)
      .filter(length(col("t")) > 4000).count() === 64)
  }

  test("projection, limit and offset pushdown slice correctly") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").cast("double").as("okey"),
        col("l_linenumber").as("lno"),
        col("l_quantity").as("qty"),
        col("l_returnflag").as("rf"))
    val path = tmp("lineitem.dta")
    DtaWriter.write(li, path)

    val back = spark.read.format("readstat").load(path)
    assert(back.count() === li.count())

    // projection: only 2 of 4 columns decoded
    val proj = back.select("okey", "qty")
    assert(proj.columns.toSeq === Seq("okey", "qty"))
    assert(proj.agg(sum("qty")).collect()(0).getDouble(0) ===
      li.agg(sum("qty")).collect()(0).getDouble(0))

    // limit + offset agree with full-read slices (FIXTURES.md §5)
    val full = back.orderBy("okey", "lno").collect().map(_.toSeq)
    val lim = back.limit(10).collect()
    assert(lim.length === 10)
    val off = back.offset(5).collect()
    assert(off.length === full.length - 5)

    // plan shows our source with pruned columns
    val planStr = proj.queryExecution.executedPlan.toString
    assert(planStr.contains("readstat") || planStr.contains("BatchScan"))
  }

  test("multi-partition read returns every row exactly once") {
    val n = 50000
    val df = spark.range(n.toLong).select(
      col("id").cast("double").as("x"),
      (col("id") % 97).cast("int").as("k"))
    val path = tmp("wide.dta")
    DtaWriter.write(df, path)
    // force small partitions: 12 bytes/record → ~4166 rows per 50 KB part
    val back = spark.read.format("readstat")
      .option("maxPartitionBytes", (50 * 1024).toString)
      .option("minRowsPerPartition", "1000")
      .load(path)
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() === n)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) === (n.toLong * (n - 1) / 2).toDouble)
  }
}
