package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.sas.{RdcEncode, SasDecompress, SasFixtureWriter}
import graft.sources.readstat.spss.SavWriter

/** zsav (zlib) and SAS RDC compressed round trips. */
class CompressedFormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_cf").resolve(name).toString

  test("zsav (compression 2) round trip through zlib blocks") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("s", StringType)))
    val rows = (0 until 5000).map(i => Row(i.toDouble, s"val$i")) :+ Row(null, null)
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("t.zsav")
    SavWriter.write(df, path)
    val back = spark.read.format("readstat").load(path)
    assert(back.rdd.getNumPartitions === 1) // sequential decode
    assert(back.count() === 5001)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) === (4999.0 * 5000 / 2))
    assert(back.filter(col("s") === "val4999").count() === 1)
    assert(back.filter(col("x").isNull).count() === 1)
  }

  test("zsav parallel block inflate equals sequential (zsavLookahead=1)") {
    // r6: the inflate stage is pipelined ahead of the sequential bytecode
    // decoder — results must be byte-identical to the lookahead=1
    // (sequential, reference-shaped) path, across a block boundary
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("s", StringType)))
    // ~50k rows of poorly-compressible strings so the bytecode stream spans
    // multiple zlib blocks even at the SPSS block size
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50000).map(i =>
      Row(i * 0.25, s"v${rnd.nextLong()}_${rnd.nextLong()}"))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("par.zsav")
    SavWriter.write(df, path)
    def readAll(lookahead: Int) = spark.read.format("readstat")
      .option("zsavLookahead", lookahead.toString)
      .load(path).orderBy("x").collect().map(_.toSeq).toSeq
    val seq = readAll(1)
    val par = readAll(16)
    assert(seq.length === 50000)
    assert(par === seq)
  }

  test("RDC encoder/decoder round-trips mixed content") {
    val rnd = new scala.util.Random(11)
    (0 until 40).foreach { _ =>
      val len = 1 + rnd.nextInt(400)
      val row = new Array[Byte](len)
      var i = 0
      while (i < len) {
        if (rnd.nextBoolean()) {
          val run = 1 + rnd.nextInt(60)
          val b = rnd.nextInt(256).toByte
          var k = 0
          while (k < run && i < len) { row(i) = b; i += 1; k += 1 }
        } else { row(i) = rnd.nextInt(256).toByte; i += 1 }
      }
      val enc = RdcEncode.encode(row)
      val dec = SasDecompress.rdc(enc, 0, enc.length, len)
      assert(dec.toSeq === row.toSeq)
    }
  }

  test("RDC-compressed sas7bdat round trip") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("num", DoubleType), StructField("s", StringType)))
    val rows = Seq(
      Row(1.0, "aaaaaaaaaaaaaaaaaaaaaaa"), Row(2.5, "bbbbbbbbbbbbbbbbbbbbbbb"),
      Row(null, null), Row(-17.25, "mixed-content-here"))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("t_rdc.sas7bdat")
    SasFixtureWriter.write(df, path, rdc = true)
    val back = spark.read.format("readstat").load(path)
    assert(back.collect().map(_.toSeq).toSeq === rows.map(_.toSeq))
  }

  test("very-long SPSS strings (>255B) segment-coalesce round trip") {
    import scala.jdk.CollectionConverters._
    val long1 = ("abcdefghij" * 60) + "XYZ"     // 603 bytes → 3 segments
    val long2 = "z" * 256                        // just over the limit
    val schema = StructType(Seq(
      StructField("t", StringType), StructField("k", DoubleType)))
    val rows = Seq(Row(long1, 1.0), Row(long2, 2.0), Row("short", 3.0), Row(null, 4.0))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("vls.sav")
    SavWriter.write(df, path)
    val back = spark.read.format("readstat").load(path)
    val got = back.orderBy("k").collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(Some(long1), Some(long2), Some("short"), None))
  }
}
