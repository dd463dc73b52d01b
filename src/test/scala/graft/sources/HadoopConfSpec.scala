package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The readstat source must use the session's Hadoop configuration — not a
  * fresh `new Configuration()` — on both the driver (schema/planning opens)
  * and executors (row-decode opens), or S3A/HDFS credentials set via
  * `spark.hadoop.*` never reach a real deployment.
  *
  * Proof: a filesystem scheme (`grafttest://`) that exists ONLY in the
  * session conf. Every open that resolves it must have used that conf; a
  * default Configuration would throw UnsupportedFileSystemException.
  */
class HadoopConfSpec extends SparkSpec {

  test("session hadoopConfiguration reaches driver and executor opens") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.grafttest.impl", classOf[GraftTestFileSystem].getName)

    // write a small dta with the library writer, then read it back via the
    // custom scheme through the full DSv2 path (schema probe on the driver,
    // partition readers on executor threads)
    val dta = "/tmp/hadoop_conf_spec.dta"
    val df = spark.range(100).select(
      col("id").cast("double").as("x"),
      concat(lit("row"), col("id")).as("s"))
    graft.sources.readstat.stata.DtaWriter.write(df, dta)

    val back = spark.read.format("readstat").load(s"grafttest://$dta")
    assert(back.schema.fieldNames.toSeq == Seq("x", "s"))
    assert(back.count() == 100)
    assert(back.agg(sum("x")).collect()(0).getDouble(0) == 4950.0)
  }
}

/** Local filesystem that answers only to `grafttest://` — resolvable solely
  * through the session conf entry the spec sets.
  */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("grafttest:///")
  override def checkPath(path: org.apache.hadoop.fs.Path): Unit = ()
}
