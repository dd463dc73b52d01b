package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract of the native `graft_nfc` expression (q101's kernel). */
class NormFunctionsSpec extends SparkSpec {

  private def registered = {
    NormFunctions.register(spark)
    spark
  }

  test("kernel: ASCII fast path returns the SAME UTF8String instance") {
    val u = UTF8String.fromString("plain ascii text 123")
    assert(NormKernels.nfc(u) eq u)
  }

  test("kernel: already-NFC non-ASCII returns the original instance") {
    val u = UTF8String.fromString("d\u00e9j\u00e0 vu") // precomposed \u00e9, \u00e0
    assert(NormKernels.nfc(u) eq u)
  }

  test("kernel: decomposed sequences compose") {
    // e + U+0301 composes to U+00E9; o + U+0308 to U+00F6
    val u = UTF8String.fromString("Cafe\u0301 o\u0308")
    assert(NormKernels.nfc(u).toString === "Caf\u00e9 \u00f6")
  }

  test("expression composes through SQL (analyzer + codegen path)") {
    val r = registered.sql(
      "SELECT graft_nfc('Cafe\u0301') AS s, length(graft_nfc('Cafe\u0301')) AS n")
    assert(r.head.getString(0) === "Caf\u00e9")
    assert(r.head.getInt(1) === 4)
  }

  test("null propagates; non-null columns stay non-null") {
    val df = registered.range(4)
      .select(when(col("id") % 2 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("x"), col("id"))).as("t"))
      .select(expr("graft_nfc(t)").as("n"))
    assert(df.filter(col("n").isNull).count() === 2)
    assert(df.filter(col("n").isNotNull).count() === 2)
  }

  test("interpreted and codegen paths agree over a mixed column") {
    // expression in a wide projection (codegen) vs direct kernel calls
    val vals = Seq("ascii only", "Cafe\u0301 deco", "de\u0301ja\u0300", "",
      "mix\u00e9d \u00e5cii", "\u0301leading combining")
    val df = registered.createDataset(vals)(
      org.apache.spark.sql.Encoders.STRING).toDF("t")
      .select(expr("graft_nfc(t)").as("n"))
    val got = df.collect().map(_.getString(0)).toSeq
    val want = vals.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got === want)
  }

  test("whole-stage codegen keeps the expression in the span") {
    val df = registered.range(8).select(expr("graft_nfc(CAST(id AS STRING))"))
    // the executedPlan's compact render marks codegen'd spans with "*(n)";
    // the projection carrying nfcnormalize must be inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("nfcnormalize") && l.trim.startsWith("*(")), plan)
  }
}
