package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("approx_count_distinct validates within the 5% band; exact counts exact") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("p"), countDistinct("l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = ScaleOps.queries("q26_approx_distinct")(spark, d).collect()
    assert(got.map(_.getString(0)).toSet === exact.keySet)
    got.foreach { r =>
      val (p, o) = exact(r.getString(0))
      assert(r.getLong(1) === p && r.getLong(2) === o, "exact counts must be exact")
      assert(r.getLong(3) === 1L && r.getLong(4) === 1L,
        s"${r.getString(0)}: sketch left its 5% band")
    }
  }

  test("salted join equals plain join") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = ScaleOps.saltedJoin(li, o, "l_orderkey", buckets = 8).count()
    assert(salted === plain)
  }
}
