package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The bulk lake converter (r11): drifted + corrupt container directory →
  * parquet, in one call, with the 100 TB posture on by default
  * (PERMISSIVE quarantine + mergeSchema widening) and `--strict` mapping
  * to the fail-fast interchange contract.
  */
class ConvertSpec extends SparkSpec {

  private def mkLake(): (String, String) = {
    val dir = Files.createTempDirectory("graft_lake").toString
    val sp = spark
    import sp.implicits._
    (0 until 100).map(i => (i.toShort, i * 1.5)).toDF("id", "x")
      .coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/m1.dta")
    (100 until 200).map(i => (i, i * 1.5, s"doc$i")).toDF("id", "x", "s")
      .coalesce(1).write.format("readstat").mode("overwrite").save(s"$dir/m2.dta")
    val bad = s"$dir/zz_corrupt.dta"
    Files.write(Paths.get(bad), Array.fill[Byte](2048)(0x5A))
    (dir, bad)
  }

  test("lake posture: drifted files merge, corrupt file quarantines, parquet lands") {
    val (lake, bad) = mkLake()
    val out = Files.createTempDirectory("graft_lake_out").toString + "/pq"
    val n = Convert.convert(spark, lake, out)
    assert(n === 200)
    val back = spark.read.parquet(out)
    assert(back.schema.fieldNames.toSeq === Seq("id", "x", "s"))
    assert(back.schema("id").dataType === IntegerType, "widened int16+int32")
    assert(back.filter(col("s").isNull).count() === 100)
    assert(back.agg(sum("x")).collect().head.getDouble(0) ===
      (0 until 200).map(_ * 1.5).sum)
    val reports = new java.io.File(out + ".badfiles").listFiles()
      .filter(_.getName.endsWith(".json"))
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(reports.contains("zz_corrupt.dta"), s"quarantine report, got: $reports")
  }

  test("--strict refuses the same lake (fail-fast contract intact)") {
    val (lake, _) = mkLake()
    val out = Files.createTempDirectory("graft_lake_out2").toString + "/pq"
    val e = intercept[Exception] {
      Convert.convert(spark, lake, out, strict = true)
    }
    assert(e != null)
  }
}
