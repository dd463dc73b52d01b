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
    // HLL-sketch distinct counts (approx_count_distinct). Two engines'
    // sketches can never hash-match each other, so for years this was the
    // suite's one rows-only check; the r15 upgrade (the r14 verdict's #8)
    // makes it a REAL hash check by comparing what IS engine-stable: each
    // side validates its own sketch against its own exact distinct within
    // the ±5% band and emits the band verdict alongside the exact counts —
    // the hash then pins the exact counts AND that both engines' HLLs hit
    // their accuracy contract on the same data.
    "q26_approx_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct("l_partkey", 0.02).as("ap"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct("l_orderkey", 0.02).as("ao"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <=
            lit(0.05) * col("exact_parts")).cast("long").as("parts_in_band"),
          (abs(col("ao") - col("exact_orders")) <=
            lit(0.05) * col("exact_orders")).cast("long").as("orders_in_band"))
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
    "q26_approx_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           CAST(CASE WHEN abs(approx_count_distinct(l_partkey)
                             - count(DISTINCT l_partkey))
                       <= 0.05 * count(DISTINCT l_partkey)
                THEN 1 ELSE 0 END AS BIGINT) AS parts_in_band,
           CAST(CASE WHEN abs(approx_count_distinct(l_orderkey)
                             - count(DISTINCT l_orderkey))
                       <= 0.05 * count(DISTINCT l_orderkey)
                THEN 1 ELSE 0 END AS BIGINT) AS orders_in_band
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q29_salted_join" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice),2) AS rev, count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
