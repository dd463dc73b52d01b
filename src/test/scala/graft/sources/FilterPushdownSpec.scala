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
    // string prefix/suffix/contains decode-skip (r11: StringStartsWith /
    // StringEndsWith / StringContains joined the pushdown surface)
    assert(back.filter(col("s").startsWith("g")).count() ===
      rows.count(r => r.get(1) != null))
    assert(back.filter(col("s").endsWith("2")).count() ===
      rows.count(r => r.get(1) != null && r.getString(1).endsWith("2")))
    assert(back.filter(col("s").contains("3")).count() ===
      rows.count(r => r.get(1) != null && r.getString(1).contains("3")))
    // negated string predicate: NULLs must stay dropped, non-matches kept
    assert(back.filter(!col("s").startsWith("g2")).count() ===
      rows.count(r => r.get(1) != null && !r.getString(1).startsWith("g2")))
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

  test("filters on informative-null indicator columns decode-skip role-aware (r5 fix)") {
    import scala.jdk.CollectionConverters._
    // sas: .B-tagged missing; the raw value decoder yields null exactly
    // where the indicator is non-null, so a role-blind decode-skip dropped
    // every matching row
    def tagged(letter: Char): Double = {
      val typeByte = (0xFF ^ letter.toInt).toLong
      java.lang.Double.longBitsToDouble(0x7ff0000000000000L | (typeByte << 40))
    }
    val s1 = StructType(Seq(StructField("v", DoubleType)))
    val r1 = (0 until 300).map(i =>
      Row(if (i % 3 == 0) tagged('B') else i.toDouble))
    val sasPath = tmp("ind.sas7bdat")
    SasFixtureWriter.write(spark.createDataFrame(r1.asJava, s1), sasPath)
    val sas = spark.read.format("readstat")
      .option("informativeNulls", "separate").load(sasPath)
    assert(sas.filter(col("v_null") === ".B").count() === 100)
    // sav: declared-missing code
    val s2 = StructType(Seq(StructField("code", DoubleType)))
    // note: row i=97 stores the REAL value 97.0, which equals the declared
    // missing code — it is correctly treated as declared-missing too (101)
    val r2 = (0 until 300).map(i => Row(if (i % 3 == 0) 97.0 else i.toDouble))
    val savPath = tmp("ind.sav")
    SavWriter.write(spark.createDataFrame(r2.asJava, s2), savPath,
      missingValues = Map("code" -> Seq(97.0)))
    val sav = spark.read.format("readstat")
      .option("informativeNulls", "separate").load(savPath)
    assert(sav.filter(col("code_null") === "97").count() === 101)
    // dta was already role-aware; keep it covered
    val s3 = StructType(Seq(StructField("x", IntegerType)))
    val r3 = (0 until 300).map(i => Row(if (i % 3 == 0) 0x7fffffe5 + 2 else i))
    val dtaPath = tmp("ind.dta")
    DtaWriter.write(spark.createDataFrame(r3.asJava, s3), dtaPath)
    val dta = spark.read.format("readstat")
      .option("informativeNulls", "separate").load(dtaPath)
    assert(dta.filter(col("x_null") === ".b").count() === 100)
  }
  test("sav (bytecode) filter decode-skip matches") {
    check((df, p) => SavWriter.write(df, p, compress = true), "sav")
  }
  test("sas7bdat filter decode-skip matches") {
    check((df, p) => SasFixtureWriter.write(df, p), "sas7bdat")
  }

  test("Not over an uncomparable literal keeps rows (tri-state eval, r11 fix)") {
    import scala.jdk.CollectionConverters._
    // ts =!= lit pushes Not(EqualTo(ts, java.sql.Timestamp)) — the decoded
    // side is the raw micros long, which cmp cannot compare to a Timestamp
    // literal. The old two-state eval answered "true" (keep, Spark
    // decides) for the INNER EqualTo, and the Not flipped that into a
    // skip: every row vanished at the scan. Tri-state propagates
    // "can't tell" through the Not, so all 240 non-null rows survive.
    val s = StructType(Seq(StructField("ts", TimestampType), StructField("x", DoubleType)))
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = (0 until 300).map { i =>
      Row(if (i % 5 == 0) null
          else java.sql.Timestamp.from(base.plusSeconds(i * 60L)), i.toDouble)
    }
    val path = tmp("ts.dta")
    DtaWriter.write(spark.createDataFrame(rows.asJava, s), path)
    val back = spark.read.format("readstat").load(path)
    val probe = java.sql.Timestamp.from(base.plusSeconds(60L)) // row i=1
    assert(back.filter(col("ts") =!= lit(probe)).count() === 239)
    assert(back.filter(col("ts") === lit(probe)).count() === 1)
    assert(back.filter(!(col("ts") > lit(probe))).count() === 1)
  }

  test("RowFilter tri-state lattice invariants") {
    import graft.sources.readstat.RowFilter
    import org.apache.spark.sql.sources._
    import org.apache.spark.unsafe.types.UTF8String
    val v: String => Any = {
      case "s" => UTF8String.fromString("hello")
      case "n" => java.lang.Double.valueOf(5.0)
      case "ts" => java.lang.Long.valueOf(1000L) // raw micros: literal uncomparable
      case "z" => null
    }
    val tsLit = java.sql.Timestamp.from(java.time.Instant.EPOCH)
    // determinate leaves
    assert(RowFilter.eval(EqualTo("n", 5.0), v) === Some(true))
    assert(RowFilter.eval(EqualTo("n", 6.0), v) === Some(false))
    assert(RowFilter.eval(EqualTo("z", 6.0), v) === Some(false)) // NULL: droppable
    // uncomparable literal: unknown, and Not PRESERVES unknown
    assert(RowFilter.eval(EqualTo("ts", tsLit), v) === None)
    assert(RowFilter.eval(Not(EqualTo("ts", tsLit)), v) === None)
    assert(RowFilter.keep(Not(EqualTo("ts", tsLit)), v))
    // And/Or absorption around unknown
    assert(RowFilter.eval(And(EqualTo("ts", tsLit), EqualTo("n", 6.0)), v) === Some(false))
    assert(RowFilter.eval(And(EqualTo("ts", tsLit), EqualTo("n", 5.0)), v) === None)
    assert(RowFilter.eval(Or(EqualTo("ts", tsLit), EqualTo("n", 5.0)), v) === Some(true))
    assert(RowFilter.eval(Or(EqualTo("ts", tsLit), EqualTo("n", 6.0)), v) === None)
    // In: known-match wins; unknown member blocks a definite false
    assert(RowFilter.eval(In("n", Array(4.0, 5.0)), v) === Some(true))
    assert(RowFilter.eval(In("n", Array(4.0, 6.0)), v) === Some(false))
    assert(RowFilter.eval(In("ts", Array(tsLit)), v) === None)
    assert(RowFilter.eval(Not(In("ts", Array(tsLit))), v) === None)
    // string predicates
    assert(RowFilter.eval(StringStartsWith("s", "he"), v) === Some(true))
    assert(RowFilter.eval(StringEndsWith("s", "lo"), v) === Some(true))
    assert(RowFilter.eval(StringContains("s", "ell"), v) === Some(true))
    assert(RowFilter.eval(StringContains("s", "zzz"), v) === Some(false))
    assert(RowFilter.eval(StringStartsWith("z", "he"), v) === Some(false))
    // string predicate on a non-string decoded value: unknown, keep
    assert(RowFilter.eval(StringStartsWith("n", "5"), v) === None)
    // double negation lands back on droppable where SQL agrees:
    // NOT(NOT(z = 6)) is NULL for null z — droppable either way
    assert(RowFilter.eval(Not(Not(EqualTo("z", 6.0))), v) === Some(false))
  }
}
