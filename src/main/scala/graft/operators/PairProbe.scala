package graft.operators

import org.apache.spark.sql.SparkSession

/** Throwaway-style diagnostic main for the pair-stage plans: times a query
  * cold/warm in one JVM and prints exchange/reuse/decode occurrence counts
  * from the final adaptive plan — how the r13 size-adaptive split's
  * reuse claims get checked without the UI.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q105_image_neardup")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (q == "waterfall125") {
      import org.apache.spark.sql.functions._
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        var t = System.nanoTime()
        def lap(tag: String): Unit = {
          val now = System.nanoTime()
          println(f"[probe] waterfall125 run$i $tag: ${(now - t) / 1e9}%.2f s")
          t = now
        }
        val a = graft.operators.MultimodalOps.imageAssets(spark, d).toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); lap("a_fill")
        val ok = a.filter(col("ok"))
        val ek = ok.groupBy("digest").agg(min("doc_id").as("exact_keeper"))
        val withK = ok.join(ek, "digest")
          .select(col("doc_id"), col("exact_keeper"), col("phash"))
        val survivors = withK.filter(col("doc_id") === col("exact_keeper"))
          .select(col("doc_id"), col("phash").as("dhash"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        survivors.count(); lap("survivors")
        val pairs = MultimodalOps.hammingNearDup(survivors)
        pairs.count(); lap("pairs")
        val comp = GraphOps.connectedComponents(
          pairs.select(col("ia").as("u"), col("ib").as("v")))
        lap("cc")
        val rep = survivors.select("doc_id")
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id").as("exact_keeper"),
            coalesce(col("cluster_id"), col("doc_id")).as("keeper_rep"))
        val res = a.select("doc_id", "ok")
          .join(withK.select("doc_id", "exact_keeper"), Seq("doc_id"), "left")
          .join(rep, Seq("exact_keeper"), "left")
          .select(col("doc_id"), col("exact_keeper"), col("keeper_rep"))
        res.count(); lap("assemble")
        spark.catalog.clearCache()
      }
      spark.stop()
      return
    }
    if (q == "assets125") {
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n1 = graft.operators.MultimodalOps.imageAssets(spark, d).toDF().count()
        val t1 = System.nanoTime()
        val n2 = graft.operators.MultimodalOps.audioAssets(spark, d).toDF().count()
        println(f"[probe] assets125 run$i: img ${(t1 - t0) / 1e9}%.2f s ($n1), " +
          f"aud ${(System.nanoTime() - t1) / 1e9}%.2f s ($n2)")
      }
      spark.stop()
      return
    }
    if (q == "decode105" || q == "decode106") {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = if (q == "decode105") graft.operators.MultimodalOps.imageDHashes(spark, d).toDF().count()
                else graft.operators.MultimodalOps.audioFingerprints(spark, d).toDF().count()
        println(f"[probe] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.stop()
      return
    }
    var last: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      last = graft.SparkEntry.queries(q)(spark, d)
      last.count()
      println(f"[probe] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val p = last.queryExecution.executedPlan.toString
    for (k <- Seq("ReusedExchange", "Exchange", "AQEShuffleRead", "Window",
        "MapPartitions", "SerializeFromObject", "ShuffleQueryStage", "Sort"))
      println(s"[probe] $k: " + k.r.findAllIn(p).size)
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) println(p)
    spark.stop()
  }
}
