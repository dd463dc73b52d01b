package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.readstat.sas.SasFixtureWriter
import graft.sources.readstat.spss.SavWriter
import graft.sources.readstat.stata.DtaWriter

/** Deterministic fuzz round trips: random schemas and values (nulls,
  * unicode, boundary-ish doubles, strings past the short-string limits so
  * dta strL / sav VLS engage) through each writer → DSv2 reader → exact
  * compare. Seeded, so a failure is a reproducible case, not a flake.
  *
  * Expected-value normalization mirrors the formats' fixed-width
  * semantics: trailing spaces are padding (stripped on read) and
  * empty/whitespace-only strings read back as null under the default
  * `missingStringAsNull`.
  */
class FuzzRoundTripSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_fuzz").resolve(name).toString

  // one generator stack shared with the pandas crosscheck fixtures, so both
  // harnesses fuzz the same value space
  import graft.tools.FuzzFixtures.{randDouble, randString}

  /** What the scan should yield for a written string cell: trailing spaces
    * strip on read (space-padded sav/sas cells; dta str# trims like the
    * reference, src/stata/data.rs:827-832) and empty reads back as null
    * (missingStringAsNull). dta strL PRESERVES trailing spaces (reference
    * load_strls strips NULs only) — the fuzz generator therefore avoids
    * trailing spaces for dta so one normalization covers both paths; the
    * str#-vs-strL asymmetry is pinned by the dedicated test below.
    */
  private def normString(s: String): String =
    if (s == null) null
    else {
      val t = s.replaceAll(" +$", "")
      if (t.isEmpty) null else t
    }

  private def runTrial(seed: Int, fmt: String): Unit = {
    import scala.jdk.CollectionConverters._
    val r = new Random(seed)
    val nRows = 200 + r.nextInt(300)
    // key + a random mix of columns the format supports
    val colDefs = scala.collection.mutable.ArrayBuffer[(String, DataType, Int)]()
    colDefs += (("k", DoubleType, 0))
    val nCols = 2 + r.nextInt(4)
    for (i <- 0 until nCols) {
      val t = r.nextInt(4) match {
        case 0 => ("d", DoubleType, 0)
        case 1 => ("s", StringType, 1 + r.nextInt(40))
        // long strings: sav VLS (>255) / dta strL (>2045) territory
        case 2 => ("l", StringType, 200 + r.nextInt(if (fmt == "dta") 2200 else 200))
        case 3 => if (fmt == "sas") ("d", DoubleType, 0) else ("t", DateType, 0)
      }
      colDefs += ((s"${t._1}$i", t._2, t._3))
    }
    val schema = StructType(colDefs.map(c => StructField(c._1, c._2)).toSeq)
    val rows = (0 until nRows).map { i =>
      Row.fromSeq(colDefs.map {
        case ("k", _, _) => i.toDouble
        case (_, _, w) if r.nextInt(10) == 0 => null // ~10% nulls everywhere
        case (_, DoubleType, _) => randDouble(r)
        case (_, StringType, w) =>
          val s = randString(r, w)
          if (fmt == "dta") s.replaceAll(" +$", "") else s
        case (_, DateType, _) => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(r.nextInt(40000) - 20000L))
        case other => throw new IllegalStateException(other.toString)
      }.toSeq)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val path = fmt match {
      case "dta" => val p = tmp(s"f$seed.dta"); DtaWriter.write(df, p); p
      case "sav" => val p = tmp(s"f$seed.sav"); SavWriter.write(df, p, compress = r.nextBoolean()); p
      case "zsav" => val p = tmp(s"f$seed.zsav"); SavWriter.write(df, p); p
      case "sas" => val p = tmp(s"f$seed.sas7bdat"); SasFixtureWriter.write(df, p, rle = r.nextBoolean()); p
    }
    val back = spark.read.format("readstat").load(path)
      .orderBy("k").collect()
    assert(back.length === nRows, s"$fmt seed $seed: row count")
    val expected = rows.sortBy(r => r.getDouble(0))
    for ((exp, got) <- expected.zip(back); ci <- colDefs.indices) {
      val e = colDefs(ci)._2 match {
        case StringType => normString(exp.getAs[String](ci))
        case _ => exp.get(ci)
      }
      assert(got.get(ci) === e,
        s"$fmt seed $seed row ${exp.get(0)} col ${colDefs(ci)._1}: wrote ${exp.get(ci)}, read ${got.get(ci)}")
    }
  }

  // default 5 trials per format in CI; widen locally for a deeper sweep,
  // e.g. GRAFT_FUZZ_TRIALS=30 sbt "Test/testOnly graft.sources.FuzzRoundTripSpec"
  private val nTrials = sys.env.getOrElse("GRAFT_FUZZ_TRIALS", "5").toInt

  for (fmt <- Seq("dta", "sav", "zsav", "sas"); seed <- 1 to nTrials)
    test(s"fuzz round trip $fmt seed $seed") { runTrial(seed * 7919, fmt) }

  test("fuzz labeled round trip: unicode value labels + unlabeled fallback (dta)") {
    // labels decode through the P8 path; codes without a label fall back to
    // renderNumber — both with non-ASCII label text
    import scala.jdk.CollectionConverters._
    val r = new Random(424243)
    val labels = (0 until 12).map(c => c -> s"label_${randString(r, 12)}_中$c").toMap
    val schema = StructType(Seq(
      StructField("k", DoubleType), StructField("code", IntegerType)))
    val rows = (0 until 300).map { i =>
      Row(i.toDouble,
        if (r.nextInt(10) == 0) null
        else Integer.valueOf(r.nextInt(20))) // 12..19 have no label → fallback
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("labeled.dta")
    DtaWriter.write(df, p, valueLabels = Map("code" -> labels))
    val got = spark.read.format("readstat").load(p).orderBy("k")
      .collect().map(r0 => Option(r0.getString(1)))
    rows.zip(got).foreach { case (exp, g) =>
      val e = Option(exp.get(1)).map(_.asInstanceOf[Int])
        .map(c => labels.getOrElse(c, c.toString))
      assert(g === e)
    }
    // raw codes with labels disabled
    val raw = spark.read.format("readstat")
      .option("valueLabelsAsStrings", "false").load(p).orderBy("k")
      .collect().map(r0 => Option(r0.get(1)))
    rows.zip(raw).foreach { case (exp, g) =>
      assert(g === Option(exp.get(1)))
    }
  }

  test("fuzz declared-missings round trip: sav user-missing codes null out (and indicate)") {
    import scala.jdk.CollectionConverters._
    val r = new Random(777777)
    val missing = Seq(97.0, 98.0, 99.0)
    val schema = StructType(Seq(
      StructField("k", DoubleType), StructField("x", DoubleType)))
    val rows = (0 until 300).map { i =>
      Row(i.toDouble,
        if (r.nextInt(10) == 0) null
        else if (r.nextInt(4) == 0) missing(r.nextInt(3))
        else r.nextInt(90).toDouble)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("missings.sav")
    SavWriter.write(df, p, missingValues = Map("x" -> missing))
    // default: declared missings read as null
    val got = spark.read.format("readstat").load(p).orderBy("k")
      .collect().map(r0 => Option(r0.get(1)))
    rows.zip(got).foreach { case (exp, g) =>
      val e = Option(exp.get(1)).filterNot(v => missing.contains(v))
      assert(g === e)
    }
    // informative nulls: the indicator renders the declared-missing code
    val ind = spark.read.format("readstat")
      .option("informativeNulls", "separate").load(p).orderBy("k")
      .collect().map(r0 => Option(r0.getString(2)))
    rows.zip(ind).foreach { case (exp, g) =>
      val e = Option(exp.get(1)).filter(v => missing.contains(v))
        .map(v => v.asInstanceOf[Double].toInt.toString)
      assert(g === e)
    }
  }

  test("fuzz columnar/row path parity across formats") {
    // the vectorized ColumnAppender path and the row-decode path must agree
    // cell-for-cell on fuzzed values (unicode, nulls, boundary doubles)
    import scala.jdk.CollectionConverters._
    for ((fmt, ext) <- Seq(("dta", ".dta"), ("sav", ".sav"), ("sas", ".sas7bdat"))) {
      val r = new Random(99991)
      val schema = StructType(Seq(
        StructField("k", DoubleType), StructField("d", DoubleType),
        StructField("s", StringType)))
      val rows = (0 until 400).map { i =>
        Row(i.toDouble,
          if (r.nextInt(8) == 0) null else randDouble(r),
          if (r.nextInt(8) == 0) null else randString(r, 24))
      }
      val df = spark.createDataFrame(rows.asJava, schema)
      val p = tmp(s"parity$ext")
      fmt match {
        case "dta" => DtaWriter.write(df, p)
        case "sav" => SavWriter.write(df, p, compress = true)
        case "sas" => SasFixtureWriter.write(df, p, rle = true)
      }
      def readAll(columnar: Boolean) = spark.read.format("readstat")
        .option("columnar", columnar.toString)
        .load(p).orderBy("k").collect().map(_.toSeq).toSeq
      val col = readAll(true)
      val row = readAll(false)
      assert(col.length === 400, s"$fmt row count")
      assert(col === row, s"$fmt: columnar and row paths disagree")
    }
  }

  test("fuzz filter pushdown: decode-skip returns exactly the engine-filtered rows") {
    // pushed filters take the EXT decode-skip path inside the scan; the
    // result must equal filtering the full read Spark-side, over fuzzed
    // values (tiny magnitudes, negatives, nulls)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    for ((fmt, ext) <- Seq(("dta", ".dta"), ("sav", ".sav"), ("sas", ".sas7bdat"))) {
      val r = new Random(31337)
      val schema = StructType(Seq(
        StructField("k", DoubleType), StructField("d", DoubleType),
        StructField("s", StringType)))
      val rows = (0 until 500).map { i =>
        Row(i.toDouble,
          if (r.nextInt(8) == 0) null else randDouble(r),
          if (r.nextInt(8) == 0) null else randString(r, 16))
      }
      val df = spark.createDataFrame(rows.asJava, schema)
      val p = tmp(s"filter$ext")
      fmt match {
        case "dta" => DtaWriter.write(df, p)
        case "sav" => SavWriter.write(df, p, compress = true)
        case "sas" => SasFixtureWriter.write(df, p, rle = false)
      }
      val full = spark.read.format("readstat").load(p)
      for (pred <- Seq(col("d") > 0.5, col("d") <= 1e-6, col("s").startsWith("a"),
          col("d").isNull, col("s").isNotNull && col("d") < 0,
          // r11: string suffix/contains now push; negations exercise the
          // tri-state Not path (nulls must stay dropped, non-matches kept)
          col("s").endsWith("b"), col("s").contains("c"),
          !col("s").startsWith("a"), !(col("d") > 0.5) || col("s").contains("d"))) {
        val pushed = spark.read.format("readstat").load(p)
          .filter(pred).select("k").collect().map(_.getDouble(0)).toSet
        // baseline: decode everything first, then filter in pure Spark on
        // the already-decoded rows — no scan-level pushdown involved
        val expected = spark.createDataFrame(
          full.collect().toSeq.asJava, full.schema).filter(pred)
          .select("k").collect().map(_.getDouble(0)).toSet
        assert(pushed === expected, s"$fmt pred $pred")
      }
    }
  }

  test("fuzz inferSchema: narrowed reads preserve every value") {
    // inferSchema narrows integral doubles to byte/short/int — values after
    // widening back must equal the full-width read, over random mixtures of
    // ranges, nulls, and a 0/1 boolean-ish column
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val r = new Random(5150)
    val schema = StructType(Seq(
      StructField("k", DoubleType), StructField("b", DoubleType),
      StructField("small", DoubleType), StructField("wide", DoubleType)))
    val rows = (0 until 400).map { i =>
      Row(i.toDouble,
        if (r.nextInt(10) == 0) null else r.nextInt(2).toDouble,
        if (r.nextInt(10) == 0) null else (r.nextInt(200) - 100).toDouble,
        if (r.nextInt(10) == 0) null else (r.nextLong() % 1000000000L).toDouble)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("infer.dta")
    DtaWriter.write(df, p)
    val plain = spark.read.format("readstat").load(p)
      .orderBy("k").collect().map(_.toSeq)
    val inferred = spark.read.format("readstat").option("inferSchema", "true").load(p)
    // narrowing happened (the point of the option)
    assert(inferred.schema("b").dataType === BooleanType)
    assert(inferred.schema("small").dataType === ByteType)
    val widened = inferred
      .select(col("k"), col("b").cast("double").as("b"),
        col("small").cast("double").as("small"), col("wide").cast("double").as("wide"))
      .orderBy("k").collect().map(_.toSeq)
    assert(widened.toSeq === plain.toSeq)
  }

  test("dta trailing spaces: str# trims (reference parity), strL preserves") {
    // reference: str# cells trim trailing spaces after decode
    // (src/stata/data.rs:827-832); strL values strip trailing NULs only
    // (load_strls src/stata/data.rs:909-912) — spaces are strL data
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("k", DoubleType),
      StructField("short", StringType), StructField("big", StringType)))
    val pad = "x" * 2500 // forces the `big` column to strL (> 2045 bytes)
    val rows = Seq(Row(1.0, "abc  ", pad + "tail  "), Row(2.0, "d", pad))
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("trailing.dta")
    DtaWriter.write(df, p)
    val got = spark.read.format("readstat").load(p).orderBy("k")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got(0)._1 === "abc")             // str# trimmed
    assert(got(0)._2 === pad + "tail  ")    // strL preserved
    assert(got(1)._1 === "d")
    assert(got(1)._2 === pad)
  }

  // r11: the directory-of-containers write path — every partition
  // assembles its own complete container with its OWN string widths, so
  // random data with per-partition width extremes is exactly where a
  // width-coupling bug would surface. Fuzz one seed per format through an
  // 8-partition dir write and the multi-file read back.
  private def runDirTrial(seed: Int, fmt: String): Unit = {
    import scala.jdk.CollectionConverters._
    val r = new scala.util.Random(seed)
    val nRows = 200 + r.nextInt(400)
    val rows = (0 until nRows).map { i =>
      Row.fromSeq(Seq(
        i.toDouble,
        if (r.nextInt(10) == 0) null else randDouble(r),
        if (r.nextInt(10) == 0) null
        else randString(r, 1 + r.nextInt(60)).replaceAll(" +$", "")))
    }
    val schema = StructType(Seq(
      StructField("k", DoubleType), StructField("x", DoubleType),
      StructField("s", StringType)))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(8)
    val dir = java.nio.file.Files.createTempDirectory(s"graft_dirfuzz_$fmt").toString
    val writeFmt = if (fmt == "sas") "sas7bdat" else fmt
    df.write.format("readstat").option("format", writeFmt)
      .mode("overwrite").save(dir)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts > 1, s"$fmt dir fuzz seed $seed: expected multiple parts, got $parts")
    val back = spark.read.format("readstat").load(dir).orderBy("k").collect()
    assert(back.length === nRows, s"$fmt dir fuzz seed $seed: row count")
    val expected = rows.sortBy(_.getDouble(0))
    for ((exp, got) <- expected.zip(back)) {
      assert(got.get(1) === exp.get(1), s"$fmt dir fuzz seed $seed k=${exp.get(0)}: x")
      val e = normString(exp.getAs[String](2))
      assert(got.get(2) === e, s"$fmt dir fuzz seed $seed k=${exp.get(0)}: s")
    }
  }

  for (fmt <- Seq("dta", "sav", "zsav", "sas"))
    test(s"fuzz dir-write round trip $fmt") { runDirTrial(101 + fmt.hashCode, fmt) }
}
