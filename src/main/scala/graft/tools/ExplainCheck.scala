package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String =
      graft.SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
    // q02: filter+projection pushdown into parquet
    val p2 = plan("q02_filter_project")
    println("q02 PushedFilters: " + p2.linesIterator.filter(_.contains("PushedFilters")).take(2).mkString(" | "))
    println("q02 ReadSchema: " + p2.linesIterator.filter(_.contains("ReadSchema")).take(1).mkString)
    // q06: broadcast join present
    val p6 = plan("q06_broadcast_join")
    println("q06 broadcast: " + p6.contains("BroadcastHashJoin"))
    // q09: top-k via TakeOrderedAndProject
    println("q09 takeOrdered: " + plan("q09_sort_topk").contains("TakeOrderedAndProject"))
    // q01: partial aggregation
    println("q01 partial agg: " + plan("q01_agg_pricing").contains("HashAggregate"))
    // readstat projection pruning
    val rt = spark.read.format("readstat")
    val back = {
      val df = spark.read.parquet(s"$d/nation.parquet").selectExpr("CAST(n_nationkey AS double) k", "n_name")
      graft.sources.readstat.stata.DtaWriter.write(df, "/tmp/explain_nation.dta")
      spark.read.format("readstat").load("/tmp/explain_nation.dta")
    }
    val pr = back.select("n_name").queryExecution.executedPlan.toString
    println("readstat pruned plan: " + pr.linesIterator.filter(_.contains("BatchScan")).take(1).mkString.take(200))
    println("q03 whole plan broadcast? " + plan("q03_join3_topk").contains("BroadcastHashJoin"))
    // r2: the former all-pairs scale-killers must be equi-joins now
    for (q <- Seq("q36_simhash", "q39_embedding_neardup", "q40_lsh_jaccard_verified")) {
      val p = plan(q)
      println(s"$q BNLJ: ${p.contains("BroadcastNestedLoopJoin")} cartesian: ${p.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
