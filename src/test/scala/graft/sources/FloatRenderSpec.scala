package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.stata.{DtaRowDecoder, DtaWriter}

/** Float-render parity audit (SURVEY §7.4 risk 5 / r5 verdict #6): the
  * labeled-column fallback renders unlabeled numeric values through
  * `DtaRowDecoder.renderNumber` (Java semantics). Rust's `Display` (the
  * reference) always prints shortest-round-trip decimal expansions, while
  * Java 17's `Double.toString` switches to scientific notation at |v| ≥
  * 1e7 for non-integral values and is not always shortest — e.g. 1e16
  * renders "1.0E16" here vs "10000000000000000" in Rust.
  *
  * This spec PINS the current rendering of the classic divergent values so
  * any change is deliberate, and locks the two properties that keep the
  * divergence out of every oracle-checked output: integral values below
  * 1e15 render as plain integers (identical to Rust), and no checked query
  * routes a non-integral/large value through the label fallback (README
  * "Correctness & benchmarks" documents the residual divergence).
  */
class FloatRenderSpec extends SparkSpec {

  test("renderNumber pins the classic divergent values") {
    // integral < 1e15: plain integer digits — identical in Java and Rust
    assert(DtaRowDecoder.renderNumber(5.0) === "5")
    assert(DtaRowDecoder.renderNumber(-3.0) === "-3")
    assert(DtaRowDecoder.renderNumber(999999999999999.0) === "999999999999999")
    assert(DtaRowDecoder.renderNumber(0.0) === "0")

    // 0.1 + 0.2: both engines print the shortest round-trip for this value
    assert(DtaRowDecoder.renderNumber(0.1 + 0.2) === "0.30000000000000004")
    assert(DtaRowDecoder.renderNumber(-(0.1 + 0.2)) === "-0.30000000000000004")
    assert(DtaRowDecoder.renderNumber(2.5) === "2.5")

    // ≥ 1e15: Java scientific notation — DIVERGES from Rust's decimal
    // expansion ("10000000000000000"); pinned so a change is deliberate
    assert(DtaRowDecoder.renderNumber(1e15) === "1.0E15")
    assert(DtaRowDecoder.renderNumber(1e16) === "1.0E16")
    // 1e16 + 1 is not representable; nearest neighbors round-trip exactly
    assert(DtaRowDecoder.renderNumber(1.0000000000000002e16) === "1.0000000000000002E16")
    assert(DtaRowDecoder.renderNumber(9999999999999998.0) === "9.999999999999998E15")
  }

  test("label fallback renders through renderNumber end-to-end (dta scan)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("k", DoubleType), StructField("x", DoubleType)))
    val rows = Seq(
      Row(1.0, 1.0), Row(2.0, 2.5), Row(3.0, 1e16), Row(4.0, 0.1 + 0.2))
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = Files.createTempDirectory("graft_fr").resolve("fr.dta").toString
    DtaWriter.write(df, path, valueLabels = Map("x" -> Map(1 -> "One")))
    val got = spark.read.format("readstat").load(path)
      .orderBy("k").select(col("x")).collect().map(_.getString(0)).toSeq
    assert(got === Seq("One", "2.5", "1.0E16", "0.30000000000000004"))
  }
}
