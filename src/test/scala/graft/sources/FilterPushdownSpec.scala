package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.sas.SasFixtureWriter
import graft.sources.readstat.spss.SavWriter
import graft.sources.readstat.stata.DtaWriter

/** Filter pushdown (decode-skip) correctness across all three formats. */
class FilterPushdownSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_fp").resolve(name).toString

  private val schema = StructType(Seq(
    StructField("x", DoubleType), StructField("s", StringType)))
  private val rows = (0 until 1000).map(i =>
    Row(if (i % 17 == 0) null else i.toDouble, if (i % 13 == 0) null else s"g${i % 5}"))

  private def check(write: (org.apache.spark.sql.DataFrame, String) => Unit, ext: String): Unit = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = tmp(s"t.$ext")
    write(df, path)
    val back = spark.read.format("readstat").load(path)
    // numeric comparison with nulls in play
    assert(back.filter(col("x") > 500).count() ===
      rows.count(r => r.get(0) != null && r.getDouble(0) > 500))
    // string equality
    assert(back.filter(col("s") === "g2").count() ===
      rows.count(r => "g2" == r.get(1)))
    // IS NULL / IS NOT NULL
    assert(back.filter(col("x").isNull).count() === rows.count(_.get(0) == null))
    assert(back.filter(col("s").isNotNull && col("x") <= 100).count() ===
      rows.count(r => r.get(1) != null && r.get(0) != null && r.getDouble(0) <= 100))
    // pushed filters visible in the plan
    val plan = back.filter(col("x") > 500).queryExecution.executedPlan.toString
    assert(plan.contains("readstat"))
  }

  test("dta filter decode-skip matches Spark-side filtering") {
    check((df, p) => DtaWriter.write(df, p), "dta")
  }
  test("sav (bytecode) filter decode-skip matches") {
    check((df, p) => SavWriter.write(df, p, compress = true), "sav")
  }
  test("sas7bdat filter decode-skip matches") {
    check((df, p) => SasFixtureWriter.write(df, p), "sas7bdat")
  }
}
