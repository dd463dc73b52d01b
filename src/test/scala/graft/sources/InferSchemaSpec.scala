package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `option("inferSchema","true")` — two-pass source schema inference
  * (reference SCHEMA_INFERENCE.md:90-108): pass 1 parses the container
  * schema, pass 2 scans the data and narrows numeric columns by
  * min/max/integer-ness. Plus multi-file schema validation (fail fast on
  * disagreement).
  */
class InferSchemaSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_infer").resolve(name).toString

  test("Float64 0/1 column reads back Boolean; int-ranged narrows; fractional stays") {
    val df = spark.range(300).select(
      (col("id") % 2).cast("double").as("flag"),
      (col("id") % 100).cast("double").as("small"),
      (col("id") * 1000).cast("double").as("mid"),
      (col("id") / 7.0).as("frac"),
      concat(lit("s"), col("id") % 5).as("s"))
    val path = tmp("infer.dta")
    graft.sources.readstat.stata.DtaWriter.write(df, path)

    val plain = spark.read.format("readstat").load(path)
    assert(plain.schema("flag").dataType == DoubleType)

    val inf = spark.read.format("readstat").option("inferSchema", "true").load(path)
    assert(inf.schema("flag").dataType == BooleanType)
    assert(inf.schema("small").dataType == ByteType)
    assert(inf.schema("mid").dataType == IntegerType)
    assert(inf.schema("frac").dataType == DoubleType)
    assert(inf.schema("s").dataType == StringType)

    // values survive the coercion end to end
    val r = inf.agg(
      sum(when(col("flag"), 1).otherwise(0)),
      sum(col("small").cast("long")),
      max("mid"), max("frac")).collect()(0)
    assert(r.getLong(0) == 150)
    assert(r.getLong(1) == (0 until 300).map(_ % 100).sum)
    assert(r.getInt(2) == 299000)
    assert(r.getDouble(3) == 299 / 7.0)
  }

  test("filters on coerced columns still return correct results") {
    val df = spark.range(100).select(
      (col("id") % 2).cast("double").as("flag"),
      col("id").cast("double").as("x"))
    val path = tmp("filter.dta")
    graft.sources.readstat.stata.DtaWriter.write(df, path)
    val inf = spark.read.format("readstat").option("inferSchema", "true").load(path)
    assert(inf.filter(col("flag")).count() == 50)
    assert(inf.filter(col("x") > 49.5).count() == 50)
  }

  test("multi-file loads with mismatched schemas fail fast with a clear error") {
    val p1 = tmp("m1.dta"); val p2 = tmp("m2.dta")
    graft.sources.readstat.stata.DtaWriter.write(
      spark.range(10).select(col("id").cast("double").as("x")), p1)
    graft.sources.readstat.stata.DtaWriter.write(
      spark.range(10).select(col("id").cast("double").as("x"),
        lit("extra").as("y")), p2)
    val e = intercept[Exception] {
      spark.read.format("readstat").load(p1, p2).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("schema mismatch")))
  }
}
