package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.readstat.ReadstatStream
import graft.sources.readstat.stata.DtaWriter

class ReadstatStreamSpec extends SparkSpec {

  test("batch iterator yields bounded batches totaling every row") {
    val df = spark.range(10000).select(
      col("id").cast("double").as("x"), concat(lit("r"), col("id")).as("s"))
    val path = Files.createTempDirectory("graft_bs").resolve("t.dta").toString
    DtaWriter.write(df, path)
    val it = ReadstatStream.batches(spark, path, batchSize = 1000)
    val sizes = it.map(_.size).toSeq
    assert(sizes.sum === 10000)
    assert(sizes.forall(_ <= 1000))
    // column projection + limit flow through
    val proj = ReadstatStream.batches(spark, path, batchSize = 512,
      columns = Some(Seq("x")), nRows = Some(700)).toSeq
    assert(proj.map(_.size).sum === 700)
    assert(proj.head.head.schema.fieldNames.toSeq === Seq("x"))
  }
}
