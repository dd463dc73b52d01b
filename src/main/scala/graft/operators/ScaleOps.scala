package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Scale-path operators (SURVEY.md §2.4 A3 approx distinct; §4.2 skew
  * handling): sketch-based aggregation and the salting pattern for skewed
  * join keys. At 100 TB these are the difference between a job finishing
  * and one straggler task holding the cluster.
  */
object ScaleOps {

  /** Salted join for skewed keys: the skewed (big) side gets a random salt
    * in [0, buckets); the small side is exploded `buckets` times so every
    * salted key finds its match. One shuffle, no single hot partition.
    * The salt uses a deterministic per-row hash (not rand()) so the result
    * is stable and the operation retry-safe.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int = 16): DataFrame = {
    // row-level salt: rows sharing a hot key spread across buckets
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(buckets.toLong)))
    val exploded = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HLL-sketch distinct counts (approx_count_distinct). No DuckDB oracle:
    // sketch implementations differ across engines by design — the driver
    // records a rows-only check; the ScalaTest spec asserts the ±5% bound
    // against exact counts.
    "q26_approx_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
          approx_count_distinct("l_orderkey", 0.02).as("approx_orders"))
        .orderBy("l_returnflag")
    }),

    // Salted join vs plain join parity: revenue per skewed key computed
    // through the salting path. Oracle: plain SQL join on the parquet.
    "q29_salted_join" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
      val dims = orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      saltedJoin(li, dims, "l_orderkey", buckets = 8)
        .groupBy("o_orderpriority")
        .agg(round(sum("l_extendedprice"), 2).as("rev"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    "q29_salted_join" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice),2) AS rev, count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
