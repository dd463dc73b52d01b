package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** User-specified narrow schemas must fail loudly with the column name on
  * out-of-range data — never wrap silently (r2 ADVICE #5). inferSchema
  * narrowing stays on the proven-safe path.
  */
class CoercionSafetySpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_coerce").resolve(name).toString

  test("out-of-range user-narrowed byte column names the column") {
    val p = tmp("wide.dta")
    spark.range(400).select(col("id").cast("double").as("x"))
      .write.format("readstat").mode("overwrite").save(p)
    val userSchema = StructType(Seq(StructField("x", ByteType)))
    val e = intercept[Exception] {
      spark.read.format("readstat").schema(userSchema).load(p).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("'x'") && m.contains("tinyint")),
      s"expected a column-named range error, got: ${msgs(e)}")
  }

  test("in-range user-narrowed schema still coerces") {
    val p = tmp("narrow.dta")
    spark.range(100).select((col("id") % 100).cast("double").as("x"))
      .write.format("readstat").mode("overwrite").save(p)
    val df = spark.read.format("readstat")
      .schema(StructType(Seq(StructField("x", ByteType)))).load(p)
    assert(df.agg(sum(col("x").cast("long"))).collect()(0).getLong(0) === (0 until 100).sum)
  }

  test("inferSchema end-to-end remains green after the range checks") {
    val p = tmp("infer.dta")
    spark.range(1000).select(
      (col("id") % 100).cast("double").as("small"),
      col("id").cast("double").as("wide"))
      .write.format("readstat").mode("overwrite").save(p)
    val df = spark.read.format("readstat").option("inferSchema", "true").load(p)
    assert(df.schema("small").dataType === ByteType)
    assert(df.count() === 1000)
  }
}
