package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `option("mergeSchema", "true")` multi-file loads (r11): union of columns
  * in first-appearance order, same-name conflicts widened along the closed
  * lattice (integral rank; integral/float → double; date → timestamp_ntz),
  * files missing a column reading it as null — parquet's mergeSchema
  * contract at the container level. The identical-schema fail-fast stays
  * the default (MultiFile posture since r1), and non-widenable conflicts
  * stay column-named errors even under mergeSchema.
  */
class MergeSchemaSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** month 1: (id int16, x double); month 2 adds a string column and
    * re-codes id to int32 — the canonical drift pair.
    */
  private def driftCorpus(): String = {
    val dir = tmp("graft_merge")
    val sp = spark
    import sp.implicits._
    (0 until 100).map(i => (i.toShort, i * 1.5)).toDF("id", "x")
      .coalesce(1).write.format("readstat").mode("overwrite")
      .save(s"$dir/m1.dta")
    (100 until 200).map(i => (i, i * 1.5, s"doc$i")).toDF("id", "x", "s")
      .coalesce(1).write.format("readstat").mode("overwrite")
      .save(s"$dir/m2.dta")
    dir
  }

  test("union + widen: added column null-fills, int16+int32 widens to int32") {
    val dir = driftCorpus()
    val df = spark.read.format("readstat").option("mergeSchema", "true").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("id", "x", "s"),
      "first-appearance column order")
    assert(df.schema("id").dataType === IntegerType, "int16+int32 -> int32")
    assert(df.schema("x").dataType === DoubleType)
    assert(df.schema("s").dataType === StringType)
    val rows = df.collect()
    assert(rows.length === 200)
    val byId = rows.map(r => r.getInt(0) -> r).toMap
    assert(byId(5).isNullAt(2), "m1 rows read the missing column as null")
    assert(byId(150).getString(2) === "doc150")
    assert(byId(5).getDouble(1) === 7.5 && byId(150).getDouble(1) === 225.0)
  }

  test("default stays fail-fast, and the error now points at mergeSchema") {
    val dir = driftCorpus()
    val e = intercept[IllegalArgumentException] {
      spark.read.format("readstat").load(dir).collect()
    }
    assert(e.getMessage.contains("schema mismatch"))
    assert(e.getMessage.contains("mergeSchema"))
  }

  test("float+double widens to double; values exact") {
    val dir = tmp("graft_merge_fd")
    val sp = spark
    import sp.implicits._
    Seq(1.5f, 2.25f).toDF("y").coalesce(1)
      .write.format("readstat").mode("overwrite").save(s"$dir/a.dta")
    Seq(3.125, 4.0625).toDF("y").coalesce(1)
      .write.format("readstat").mode("overwrite").save(s"$dir/b.dta")
    val df = spark.read.format("readstat").option("mergeSchema", "true").load(dir)
    assert(df.schema("y").dataType === DoubleType)
    assert(df.select("y").collect().map(_.getDouble(0)).sorted.toSeq ===
      Seq(1.5, 2.25, 3.125, 4.0625))
  }

  test("date+timestamp widens to timestamp_ntz; dates render as midnight") {
    val dir = tmp("graft_merge_dt")
    val df1 = spark.sql("SELECT DATE'2024-03-05' AS d")
    val df2 = spark.sql("SELECT TIMESTAMP_NTZ'2024-06-07 12:34:56' AS d")
    df1.coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/a.dta")
    df2.coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/b.dta")
    val df = spark.read.format("readstat").option("mergeSchema", "true").load(dir)
    assert(df.schema("d").dataType === TimestampNTZType)
    val got = df.select(date_format(col("d"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("2024-03-05 00:00:00", "2024-06-07 12:34:56"))
  }

  test("string vs numeric conflict is a column-named error even with mergeSchema") {
    val dir = tmp("graft_merge_conflict")
    val sp = spark
    import sp.implicits._
    Seq(1.0, 2.0).toDF("x").coalesce(1)
      .write.format("readstat").mode("overwrite").save(s"$dir/a.dta")
    Seq("one", "two").toDF("x").coalesce(1)
      .write.format("readstat").mode("overwrite").save(s"$dir/b.dta")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("readstat").option("mergeSchema", "true").load(dir).collect()
    }
    assert(e.getMessage.contains("'x'"))
    assert(e.getMessage.contains("not widenable"))
  }

  test("filters and projection stay correct across drifted files") {
    val dir = driftCorpus()
    val df = spark.read.format("readstat").option("mergeSchema", "true").load(dir)
    // filter on the added column: only m2 can match; m1's rows must not
    // leak through the per-file pushdown-drop
    assert(df.filter(col("s") === "doc150").count() === 1)
    assert(df.filter(col("s").isNull).count() === 100)
    // filter on the widened column spans both files (m1 decodes int16,
    // m2 int32 — the filter crosses the widening boundary)
    assert(df.filter(col("id") >= 90 && col("id") < 110).count() === 20)
    // projection of the added column alone: m1 partitions produce nulls
    val s = df.select("s").collect()
    assert(s.count(_.isNullAt(0)) === 100 && s.count(!_.isNullAt(0)) === 100)
  }

  test("mergeSchema composes with PERMISSIVE quarantine") {
    val dir = driftCorpus()
    Files.write(Paths.get(s"$dir/zz_garbage.dta"), Array.fill[Byte](2048)(0x5A))
    val df = spark.read.format("readstat")
      .option("mergeSchema", "true").option("mode", "PERMISSIVE").load(dir)
    assert(df.count() === 200, "good drifted files merge; corrupt one quarantined")
    assert(df.schema.fieldNames.toSeq === Seq("id", "x", "s"))
  }

  test("uniform-schema load is unchanged by the option (columnar path intact)") {
    val dir = tmp("graft_merge_uniform")
    val sp = spark
    import sp.implicits._
    for (i <- 0 until 2)
      (0 until 50).map(j => (i * 50 + j).toDouble).toDF("x")
        .coalesce(1).write.format("readstat").mode("overwrite")
        .save(s"$dir/p$i.dta")
    val df = spark.read.format("readstat").option("mergeSchema", "true").load(dir)
    assert(df.select("x").collect().map(_.getDouble(0)).sorted.toSeq ===
      (0 until 100).map(_.toDouble))
  }

  test("mergeSchema composes with inferSchema: merged then narrowed, per-file aligned") {
    val dir = tmp("graft_merge_infer")
    val sp = spark
    import sp.implicits._
    // v holds integral values stored as double in both files; the files
    // still drift (added column), so the load must merge AND the
    // inference pass must narrow v from the merged double to int16 —
    // exercising the aligning layer's natural-double -> required-short
    // narrowing converters per file (integral naturals are left alone by
    // inference, so a double column is the one that narrows)
    (0 until 100).map(i => i.toDouble).toDF("v")
      .coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/m1.dta")
    (100 until 200).map(i => (i.toDouble, s"doc$i")).toDF("v", "s")
      .coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/m2.dta")
    val df = spark.read.format("readstat")
      .option("mergeSchema", "true").option("inferSchema", "true")
      .load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("v", "s"))
    assert(df.schema("v").dataType === ShortType,
      s"integral doubles 0..199 narrow to int16, got ${df.schema("v").dataType}")
    val rows = df.collect()
    assert(rows.length === 200)
    val byV = rows.map(r => r.getShort(0).toInt -> r).toMap
    assert(byV(5).isNullAt(1) && byV(150).getString(1) === "doc150")
    assert(byV.keySet === (0 until 200).toSet)
  }
}
