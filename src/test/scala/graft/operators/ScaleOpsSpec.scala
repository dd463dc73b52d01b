package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("approx_count_distinct is within its 2% rsd bound (±5x margin)") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("p"), countDistinct("l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, _)) =>
      val ap = ScaleOps.queries("q26_approx_distinct")(spark, d)
        .filter(col("l_returnflag") === k).collect()(0).getLong(1)
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k: approx $ap vs exact $p")
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
