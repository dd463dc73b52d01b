package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.spss.SavWriter

/** SPSS long-string value labels (subtype 21) and long-string missing
  * values (subtype 22).
  */
class SavLongStringSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_ls").resolve(name).toString

  test("long-string value labels decode string codes to labels") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("grade", StringType)))
    val rows = Seq(Row("excellent"), Row("poor"), Row("unmapped"), Row(null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("lsvl.sav")
    SavWriter.write(df, path, stringValueLabels =
      Map("grade" -> Map("excellent" -> "A", "poor" -> "F")))
    val back = spark.read.format("readstat").load(path)
    assert(back.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("A"), Some("F"), Some("unmapped"), None))
  }

  test("long-string missing codes become nulls (+ indicator when tracked)") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("resp", StringType)))
    val rows = Seq(Row("yes"), Row("REFUSED"), Row("N/A"), Row("no"))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp("lsmv.sav")
    SavWriter.write(df, path, stringMissingValues =
      Map("resp" -> Seq("REFUSED", "N/A")))
    val plain = spark.read.format("readstat").load(path)
    assert(plain.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("yes"), None, None, Some("no")))
    val sep = spark.read.format("readstat")
      .option("informativeNulls", "separate").load(path)
    assert(sep.columns.toSeq === Seq("resp", "resp_null"))
    assert(sep.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq ===
      Seq((Some("yes"), None), (None, Some("REFUSED")), (None, Some("N/A")), (Some("no"), None)))
  }
}
