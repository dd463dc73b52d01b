package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** df.write.format("readstat") end-to-end for dta / sav / sas7bdat. */
class WritePathSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_w").resolve(name).toString

  private def roundTrip(ext: String): Unit = {
    val df = spark.range(500).select(
      col("id").cast("double").as("x"),
      concat(lit("name"), col("id") % 13).as("s"))
    val path = tmp(s"out.$ext")
    df.coalesce(1).write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() === 500)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) === (499.0 * 500 / 2))
    assert(back.select("s").distinct().count() === 13)
  }

  test("write.format(readstat).save -> .dta") { roundTrip("dta") }
  test("write.format(readstat).save -> .sav") { roundTrip("sav") }
  test("write.format(readstat).save -> .sas7bdat") { roundTrip("sas7bdat") }

  test("sink compression options: sas rle, sav bytecode, zsav zlib") {
    val df = spark.range(2000).select(
      col("id").cast("double").as("x"),
      lit("a" * 200).as("pad")) // long run → compresses well
    def sized(path: String, opts: Map[String, String]): Long = {
      var w = df.coalesce(1).write.format("readstat").mode("overwrite")
      opts.foreach { case (k, v) => w = w.option(k, v) }
      w.save(path)
      val back = spark.read.format("readstat").load(path)
      assert(back.count() === 2000)
      assert(back.agg(sum("x")).collect()(0).getDouble(0) === (1999.0 * 2000 / 2))
      new java.io.File(path).length()
    }
    val plainSas = sized(tmp("p.sas7bdat"), Map.empty)
    val rleSas = sized(tmp("c.sas7bdat"), Map("compression" -> "rle"))
    assert(rleSas < plainSas / 2, s"rle $rleSas vs plain $plainSas")
    // SPSS bytecode only compresses space runs and small bias-range
    // integers — shape the data for its codec: one long row makes every
    // other row mostly trailing-space padding, and x stays in bias range
    val savDf = spark.range(2000).select(
      (col("id") % 100).cast("double").as("x"),
      when(col("id") === 0, lit("a" * 200)).otherwise(lit("a")).as("pad"))
    def sizedSav(path: String, opts: Map[String, String]): Long = {
      var w = savDf.coalesce(1).write.format("readstat").mode("overwrite")
      opts.foreach { case (k, v) => w = w.option(k, v) }
      w.save(path)
      val back = spark.read.format("readstat").load(path)
      assert(back.count() === 2000)
      new java.io.File(path).length()
    }
    val plainSav = sizedSav(tmp("p.sav"), Map.empty)
    val bcSav = sizedSav(tmp("c.sav"), Map("compression" -> "bytecode"))
    assert(bcSav < plainSav / 2, s"bytecode $bcSav vs plain $plainSav")
    val zsav = sizedSav(tmp("c.zsav"), Map.empty)
    assert(zsav < bcSav, s"zsav $zsav vs bytecode $bcSav")
  }

  test("multi-partition dta/sav writes distribute the encode (no coalesce needed)") {
    // r3: executors encode part buffers in parallel; the driver frames and
    // concatenates in partition order
    val df = spark.range(50000).repartition(8).select(
      col("id").cast("double").as("x"),
      (col("id") % 7).cast("int").as("k"),
      date_add(lit(java.sql.Date.valueOf("2021-06-01")), (col("id") % 200).cast("int")).as("d"),
      concat(lit("str_"), col("id") % 991).as("s"))
    for (ext <- Seq("dta", "sav", "sas7bdat")) {
      val path = tmp(s"multi.$ext")
      df.write.format("readstat").mode("overwrite").save(path)
      val back = spark.read.format("readstat").load(path)
      assert(back.count() === 50000)
      val agg = back.agg(sum("x"), countDistinct("s"), max("d")).collect()(0)
      assert(agg.getDouble(0) === (49999.0 * 50000 / 2), ext)
      assert(agg.getLong(1) === 991, ext)
      assert(agg.get(2).toString === "2021-12-17", ext)
      // no staging residue
      assert(!new java.io.File(path + ".spill-parts").exists(), ext)
    }
  }

  test("multi-partition sav write with declared missings + string labels (r5: distributed)") {
    // r4 verdict #3: these extras previously fell back to a driver-side
    // toLocalIterator loop; now they thread through the framed DSv2 sink
    // with any partition count
    val longStr = "v" * 300 // > 255 → very-long-string segments + subtype 21/22
    val df = spark.range(20000).repartition(8).select(
      (col("id") % 100).cast("double").as("code"),
      when(col("id") % 7 === 0, concat(lit(longStr), lit("A")))
        .otherwise(concat(lit(longStr), lit("B"))).as("s"))
    val path = tmp("extras_multi.sav")
    graft.sources.readstat.spss.SavWriter.write(
      df, path,
      missingValues = Map("code" -> Seq(97.0, 99.0)),
      stringValueLabels = Map("s" -> Map(longStr + "A" -> "Variant A")),
      stringMissingValues = Map("s" -> Seq(longStr + "B")))
    assert(!new java.io.File(path + ".spill-parts").exists())
    // declared missings decode to null on read
    val back = spark.read.format("readstat").load(path)
    assert(back.count() === 20000)
    assert(back.filter(col("code").isNull).count() ===
      df.filter(col("code").isin(97.0, 99.0)).count())
    // informative nulls surface the declared codes (proves the missing-value
    // records landed in the variable-record framing)
    val sep = spark.read.format("readstat")
      .option("informativeNulls", "separate")
      .option("informativeNullColumns", "code").load(path)
    assert(sep.columns.contains("code_null"))
    assert(sep.filter(col("code_null") === "97").count() === 200)
  }

  test("multi-partition dta write with strL columns rebases GSO refs at concat") {
    val long1 = "L" * 3000 // > 2045 bytes → strL
    val df = spark.range(4000).repartition(4).select(
      col("id").cast("double").as("x"),
      when(col("id") % 5 === 0, lit(null)).otherwise(
        concat(lit(long1), col("id") % 17)).as("blob"))
    val path = tmp("strl_multi.dta")
    df.write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() === 4000)
    assert(back.filter(col("blob").isNull).count() === 800)
    assert(back.filter(col("blob").isNotNull).select(length(col("blob")))
      .distinct().collect().map(_.getInt(0)).toSet === Set(3001, 3002))
    assert(back.select("blob").distinct().count() === 18) // 17 values + null
  }

  test("multi-partition compressed sas writes round-trip (rle + rdc, both paths)") {
    // r4: RLE/RDC rows are independent subheaders, so both the DSv2 sink
    // (driver compresses while streaming parts) and the library call
    // (executors compress, driver concatenates) accept any partition count
    val df = spark.range(30000).repartition(8).select(
      col("id").cast("double").as("x"),
      date_add(lit(java.sql.Date.valueOf("2021-06-01")), (col("id") % 200).cast("int")).as("d"),
      concat(lit("pad_"), lit("a" * 80), col("id") % 991).as("s"))
    def check(path: String): Unit = {
      val back = spark.read.format("readstat").load(path)
      assert(back.count() === 30000, path)
      val agg = back.agg(sum("x"), countDistinct("s"), max("d")).collect()(0)
      assert(agg.getDouble(0) === (29999.0 * 30000 / 2), path)
      assert(agg.getLong(1) === 991, path)
      assert(agg.get(2).toString === "2021-12-17", path)
      assert(!new java.io.File(path + ".spill-parts").exists(), path)
    }
    for (codec <- Seq("rle", "rdc")) {
      val sinkPath = tmp(s"multi_$codec.sas7bdat")
      df.write.format("readstat").mode("overwrite")
        .option("compression", codec).save(sinkPath)
      check(sinkPath)
      val libPath = tmp(s"multi_lib_$codec.sas7bdat")
      graft.sources.readstat.sas.SasFixtureWriter.write(
        df, libPath, rle = codec == "rle", rdc = codec == "rdc")
      check(libPath)
      // compression actually engaged: the padded string column is run-heavy
      val plain = tmp(s"plain_$codec.sas7bdat")
      df.write.format("readstat").mode("overwrite").save(plain)
      assert(new java.io.File(sinkPath).length() < new java.io.File(plain).length() / 2)
    }
  }

  test("2M-row write streams through the spill file (dates, timestamps, strings)") {
    // the writer must be O(1) memory in the row count: rows spill to a temp
    // file during write() and replay on commit — this would OOM the old
    // buffer-everything writer long before a real heap cap
    val df = spark.range(2000000).select(
      col("id").cast("double").as("x"),
      (col("id") % 1000).cast("int").as("k"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")), (col("id") % 365).cast("int")).as("d"),
      concat(lit("payload_"), col("id") % 997).as("s"))
    val path = tmp("big.dta")
    df.coalesce(1).write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat").load(path)
    assert(back.count() === 2000000)
    val agg = back.agg(sum("x"), countDistinct("s"), max("d")).collect()(0)
    assert(agg.getDouble(0) === (1999999.0 * 2000000 / 2))
    assert(agg.getLong(1) === 997)
    assert(agg.get(2).toString === "2020-12-30")
  }

  test("sink label options: valueLabels + variableLabels round-trip") {
    val df = spark.range(60).select(
      (col("id") % 3 + 1).cast("int").as("status"),
      col("id").cast("double").as("x"))
    val vl = """{"status":{"1":"Low","2":"Mid","3":"High"}}"""
    for (ext <- Seq("dta", "sav")) {
      val path = tmp(s"lbl.$ext")
      df.coalesce(1).write.format("readstat").mode("overwrite")
        .option("valueLabels", vl)
        .option("variableLabels", """{"status":"Current status"}""")
        .save(path)
      val back = spark.read.format("readstat").load(path)
      // labeled column reads back as strings by default
      val got = back.groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("Low" -> 20L, "Mid" -> 20L, "High" -> 20L), s"$ext: $got")
      if (ext == "dta") {
        val meta = graft.sources.readstat.ReadstatMetadata.describe(spark, path)
          .filter(col("column_name") === "status").collect()(0)
        assert(meta.getAs[String]("label") == "Current status")
      }
    }
  }

  test("multi-file load unions partitions across files") {
    val a = spark.range(100).select(col("id").cast("double").as("x"))
    val b = spark.range(100, 250).select(col("id").cast("double").as("x"))
    val p1 = tmp("a.dta"); val p2 = tmp("b.dta")
    a.coalesce(1).write.format("readstat").mode("overwrite").save(p1)
    b.coalesce(1).write.format("readstat").mode("overwrite").save(p2)
    val both = spark.read.format("readstat").load(p1, p2)
    assert(both.count() === 250)
    assert(both.agg(sum("x")).collect()(0).getDouble(0) === (249.0 * 250 / 2))
  }

  // --- directory-of-containers mode (r10 verdict #3) ---

  private def dirRoundTrip(format: String, nParts: Int): Unit = {
    val df = spark.range(8000).select(
      col("id").cast("double").as("x"),
      // per-partition max widths differ (self-consistent containers)
      concat(lit("v"), col("id") % 977).as("s"))
      .repartition(nParts)
    val dir = tmp(s"dir_$format")
    df.write.format("readstat").option("format", format).mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length === nParts,
      s"$format: expected one container per partition, got ${files.map(_.getName).toSeq}")
    assert(files.forall(_.getName.endsWith(
      graft.sources.readstat.ReadstatWriteSupport.extensionFor(format))))
    assert(!new java.io.File(dir, ".spill-parts").exists(), "staging must be cleaned")
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() === 8000)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) === (7999.0 * 8000 / 2))
    assert(back.select("s").distinct().count() === 977)
  }

  test("directory write at 8 partitions: one container per partition, dta") {
    dirRoundTrip("dta", 8)
  }
  test("directory write at 8 partitions: one container per partition, sav") {
    dirRoundTrip("sav", 8)
  }
  test("directory write at 8 partitions: one container per partition, sas7bdat") {
    dirRoundTrip("sas7bdat", 8)
  }
  test("directory write: zsav parts round-trip through zlib") {
    dirRoundTrip("zsav", 4)
  }

  test("directory write: overwrite clears previous parts; empty write stays readable") {
    val sp = spark
    import sp.implicits._
    val dir = tmp("dir_over")
    spark.range(100).select(col("id").cast("double").as("x")).repartition(8)
      .write.format("readstat").option("format", "dta").mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".dta")) === 8)
    // second write with fewer partitions must not leave stale parts behind
    spark.range(50).select(col("id").cast("double").as("x")).repartition(2)
      .write.format("readstat").option("format", "dta").mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".dta")) === 2)
    assert(spark.read.format("readstat").load(dir).count() === 50)
    // all-empty write emits one zero-row container so the load still works
    Seq.empty[Double].toDF("x")
      .write.format("readstat").option("format", "dta").mode("overwrite").save(dir)
    val back = spark.read.format("readstat").load(dir)
    assert(back.count() === 0 && back.schema.fieldNames.toSeq === Seq("x"))
  }

  test("directory write without a format option fails with a named error") {
    val e = intercept[Exception] {
      spark.range(10).select(col("id").cast("double").as("x"))
        .write.format("readstat").mode("overwrite").save(tmp("dir_nofmt"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("directory mode")), s"got: ${msgs(e)}")
  }
}
