package graft.sources.readstat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Bounded-memory batch iteration (SURVEY.md §2.1 S5; `readstat_batch_iter`
  * reference `src/readstat_stream.rs:53-140`).
  *
  * In Spark the pull-based batch iterator is `toLocalIterator` over the
  * partitioned scan: each partition is computed on demand, so peak driver
  * memory is one partition (bounded by maxPartitionBytes), matching the
  * reference's bounded-channel guarantee. `batches` re-chunks that row
  * stream into fixed-size batches for consumers that want the reference's
  * batch shape.
  */
object ReadstatStream {

  def batches(
      spark: SparkSession,
      path: String,
      batchSize: Int = 8192,
      columns: Option[Seq[String]] = None,
      nRows: Option[Long] = None,
      options: Map[String, String] = Map.empty): Iterator[Seq[Row]] = {
    var df: DataFrame = options.foldLeft(spark.read.format("readstat")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)
    columns.foreach(cs => df = df.select(cs.map(org.apache.spark.sql.functions.col): _*))
    nRows.foreach(n => df = df.limit(n.toInt))
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.grouped(batchSize)
  }
}
