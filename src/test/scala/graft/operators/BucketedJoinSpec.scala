package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Executed pin for the 100 TB co-located join story: two tables written
  * `bucketBy(k)` join WITHOUT any shuffle exchange — the sort-merge join
  * reads both sides' buckets directly. This is the claim "pre-bucket the
  * big fact tables and repeated joins on the bucket key never shuffle
  * again" turned into an assertion on the executed plan, the same
  * discipline as IvfLayoutSpec's partition-pruning pin.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toFile
    import spark.implicits._
    val conf = spark.conf
    val oldBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path (broadcast would hide the exchange
      // question entirely) and plan statically so the executed plan is
      // inspectable without unwrapping AQE
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")

      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
      (1 to 10000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/left").saveAsTable("graft_bkt_left")
      (1 to 10000).map(i => (i.toLong, i * 2L)).toDF("k", "rv")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/right").saveAsTable("graft_bkt_right")

      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), "k")
      val shuffles = joined.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: ${shuffles.map(_.nodeName)}")
      assert(joined.count() == 10000L)
      assert(joined.filter($"k" === 7L).select("rv").head.getLong(0) == 14L)

      // control: the SAME data read as plain (unbucketed) parquet shuffles
      // both sides — the zero above is the bucketing, not the planner
      // getting lucky
      val plainL = spark.read.parquet(s"$dir/left")
      val plainR = spark.read.parquet(s"$dir/right")
      val plainShuffles = plainL.join(plainR, "k").queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(plainShuffles.size == 2)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }
}
