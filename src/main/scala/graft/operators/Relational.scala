package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables._

/** Relational operator surface (SURVEY.md §2.3–2.8): joins of every flavor,
  * aggregations, window functions, sorts/top-k, set ops, scalar string/date
  * functions, grouping sets. All expressed declaratively so Catalyst picks
  * the physical strategy (broadcast vs shuffle join, partial aggregation,
  * TakeOrderedAndProject for top-k) — the same plans scale from sf0.01 to a
  * 1000-executor cluster because nothing here collects to the driver.
  *
  * Every query has a DuckDB oracle with identical column names/rounding.
  * Determinism rules: final ORDER BY with a unique tiebreak, doubles rounded
  * after aggregation, timestamps formatted/cast before output.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary: hash-agg with partial (map-side) aggregation for free.
    "q01_agg_pricing" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          // round to 4 (the exact decimal width of price×(1-disc)) — rounding
          // to 2 hits exact .005 ties that engines may break differently
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Filter + projection: both pushed into the parquet scan by Catalyst.
    "q02_filter_project" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= "1998-06-01" && col("l_discount") > 0.08)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          // unrounded: a single IEEE multiply is bit-identical across engines,
          // while round-to-2 hits exact .005 ties
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // 3-way join + agg + top-k (TPC-H Q3 shape). customer is small → Catalyst
    // broadcasts it; lineitem⋈orders shuffles on the join key.
    "q03_join3_topk" -> ((s, d) => {
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // Left-semi join (EXISTS).
    "q04_semi_join" -> ((s, d) => {
      orders(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") >= 49).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Left-anti join (NOT EXISTS): customers with no order above 350k.
    "q05_anti_join" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 350000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Explicit broadcast join: part is a dimension table — never shuffle the
    // fact side for it.
    "q06_broadcast_join" -> ((s, d) => {
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum("l_extendedprice"), 2).as("brand_rev"),
          count(lit(1)).as("n_items"),
          round(avg("l_quantity"), 4).as("avg_qty"))
        .orderBy("p_brand")
    }),

    // Window: top-2 orders per customer by price (rank/filter pattern).
    "q07_window_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // Window: running sum with an explicit ROWS frame and total ordering.
    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d).filter(col("l_suppkey") <= 10)
        .select(
          col("l_suppkey"), to_date(col("l_shipdate")).as("ship_date"),
          col("l_orderkey"), col("l_linenumber"),
          round(sum("l_quantity").over(w), 2).as("running_qty"))
        .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
    }),

    // Top-k sort: Catalyst plans TakeOrderedAndProject — no full sort at scale.
    "q09_sort_topk" -> ((s, d) => {
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(15)
    }),

    // Exact distinct counts (expand + two-phase agg under the hood).
    "q10_count_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Set ops: INTERSECT then EXCEPT on order-status cohorts.
    "q11_set_ops" -> ((s, d) => {
      val o = orders(s, d)
      def cohort(st: String) =
        o.filter(col("o_orderstatus") === st).select(col("o_custkey").as("custkey")).distinct()
      cohort("F").intersect(cohort("O")).except(cohort("P")).orderBy("custkey")
    }),

    // Conditional aggregation (CASE WHEN inside agg).
    "q12_case_agg" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("n_big"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          round(avg(when(col("o_totalprice") > 200000, col("o_totalprice"))), 2).as("avg_big"))
        .orderBy("o_orderpriority")
    }),

    // Scalar string functions — all codegen'd builtins, no UDFs.
    "q13_string_funcs" -> ((s, d) => {
      part(s, d).filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          substring(col("p_name"), 1, 12).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
        .orderBy("p_partkey")
    }),

    // Date functions: extraction + min/max over timestamp columns.
    "q14_date_funcs" -> ((s, d) => {
      orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(
          count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("tot"),
          to_date(min(col("o_orderdate"))).as("first_d"),
          to_date(max(col("o_orderdate"))).as("last_d"))
        .orderBy("yr", "mon")
    }),

    // ROLLUP grouping sets; rolled-up nulls coalesced for stable ordering.
    "q15_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")
    }),

    // HAVING (post-aggregation filter). l_quantity is integer-valued so the
    // double sum is exact → the predicate is engine-independent.
    "q16_having" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_partkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(sum("l_quantity") > 180)
        .orderBy("l_partkey")
    }),

    // Scalar subquery: price above 1.05× global average (broadcast the scalar).
    "q17_scalar_subquery" -> ((s, d) => {
      val p = part(s, d)
      val thr = p.agg((avg("p_retailprice") * 1.05).as("thr"))
      p.crossJoin(broadcast(thr))
        .filter(col("p_retailprice") > col("thr"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // Full outer join between customer and per-customer order counts.
    "q18_outer_join" -> ((s, d) => {
      val oc = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      customer(s, d)
        .join(oc, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"),
          when(col("c_custkey").isNull, 0L).otherwise(1L).as("has_cust"))
        .orderBy("custkey")
    }),

    // Cross join of the two tiny dims.
    "q19_cross_join" -> ((s, d) => {
      region(s, d).crossJoin(nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    }),

    // Event-time bucketing (batch equivalent of a tumbling window).
    "q20_events_hourly" -> ((s, d) => {
      events(s, d)
        .groupBy(
          date_format(tsFromNanos("ts"), "yyyy-MM-dd HH").as("hr"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum("value"), 2).as("sum_v"),
          round(avg("value"), 4).as("avg_v"))
        .orderBy("hr", "event_type")
    }),

    // lag() transition matrix per user.
    "q21_events_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "event_type")
    }),

    // Sessionization with a 30-minute gap (batch form of session windows).
    "q22_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("is_new", // ts is exact nanos: 30 min = 1.8e12 ns
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > 1800000000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Extract a numeric field from the JSON-ish props payload via regex
    // (portable across engines, unlike JSON-path dialects).
    "q23_props_extract" -> ((s, d) => {
      events(s, d)
        .select(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
        .orderBy("bucket")
    }),

    // CUBE grouping sets.
    "q24_cube" -> ((s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("tot"))
        .orderBy("st", "pri")
    }),

    // UNION ALL + aggregate over the merged stream.
    "q25_union_all" -> ((s, d) => {
      val a = orders(s, d).select(col("o_custkey").as("custkey"), lit("order").as("src"))
      val b = customer(s, d).select(col("c_custkey").as("custkey"), lit("customer").as("src"))
      a.unionByName(b)
        .groupBy("src").agg(count(lit(1)).as("n"), countDistinct("custkey").as("n_keys"))
        .orderBy("src")
    }),

    // Non-equi (range/band) join: customers within ±50 acctbal of a supplier.
    "q27_range_join" -> ((s, d) => {
      supplier(s, d)
        .join(customer(s, d),
          col("c_acctbal").between(col("s_acctbal") - 50, col("s_acctbal") + 50))
        .groupBy("s_suppkey").agg(count(lit(1)).as("n_near"))
        .orderBy("s_suppkey")
    }),

    // As-of join pattern: for each purchase, the user's latest prior view —
    // expressed as max() over an IGNORE-NULLS-equivalent conditional window,
    // which shuffles once on user_id instead of a range self-join.
    "q28_asof_last_view" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .withColumn("last_view", max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"),
          date_format(tsFromNanos("last_view"), "yyyy-MM-dd HH:mm:ss").as("last_view_s"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty, round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         l_extendedprice*(1-l_discount) AS net_price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_discount > 0.08
         ORDER BY l_orderkey, l_linenumber""",

    "q03_join3_topk" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM customer JOIN orders ON c_custkey=o_custkey
         JOIN lineitem ON o_orderkey=l_orderkey
         WHERE c_mktsegment='BUILDING'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey AND l_quantity>=49)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",

    "q06_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice),2) AS brand_rev,
         count(*) AS n_items, round(avg(l_quantity),4) AS avg_qty
         FROM lineitem JOIN part ON l_partkey=p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q07_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 2 ORDER BY o_custkey, rn""",

    "q08_window_running" ->
      """SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date, l_orderkey, l_linenumber,
         round(sum(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
         FROM lineitem WHERE l_suppkey <= 10
         ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""",

    "q09_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",

    "q10_count_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps, count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q11_set_ops" ->
      """SELECT custkey FROM (
           (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
            INTERSECT
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus='O')
           EXCEPT
           SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus='P') t
         ORDER BY custkey""",

    "q12_case_agg" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         round(avg(CASE WHEN o_totalprice > 200000 THEN o_totalprice END),2) AS avg_big
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q13_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
         substring(p_name,1,12) AS name_pfx, CAST(length(p_name) AS BIGINT) AS name_len,
         concat(p_brand, ':', p_type) AS brand_type,
         regexp_replace(p_type, ' ', '_', 'g') AS type_us,
         regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q14_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mon,
         count(*) AS n, round(sum(o_totalprice),2) AS tot,
         CAST(min(o_orderdate) AS DATE) AS first_d, CAST(max(o_orderdate) AS DATE) AS last_d
         FROM orders GROUP BY yr, mon ORDER BY yr, mon""",

    "q15_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
         round(sum(l_quantity),2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "q16_having" ->
      """SELECT l_partkey, round(sum(l_quantity),2) AS total_qty
         FROM lineitem GROUP BY l_partkey HAVING sum(l_quantity) > 180
         ORDER BY l_partkey""",

    "q17_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         WHERE p_retailprice > (SELECT 1.05*avg(p_retailprice) FROM part)
         ORDER BY p_partkey""",

    "q18_outer_join" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
         CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders,
         CAST(CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_cust
         FROM customer FULL JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
           ON c_custkey=o_custkey
         ORDER BY custkey""",

    "q19_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",

    "q20_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hr, event_type, count(*) AS n,
         round(sum(value),2) AS sum_v, round(avg(value),4) AS avg_v
         FROM events GROUP BY hr, event_type ORDER BY hr, event_type""",

    "q21_events_transitions" ->
      """SELECT prev_type, event_type, count(*) AS n FROM (
           SELECT event_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           FROM events) t
         WHERE prev_type IS NOT NULL
         GROUP BY prev_type, event_type ORDER BY prev_type, event_type""",

    "q22_sessionize" ->
      """SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
           FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                 FROM events) s) m
         GROUP BY user_id ORDER BY user_id""",

    "q23_props_extract" ->
      """SELECT k % 10 AS bucket, count(*) AS n, CAST(min(k) AS BIGINT) AS mn, CAST(max(k) AS BIGINT) AS mx
         FROM (SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k FROM events) t
         GROUP BY bucket ORDER BY bucket""",

    "q24_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pri,
         count(*) AS n, round(sum(o_totalprice),2) AS tot
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY st, pri""",

    "q25_union_all" ->
      """SELECT src, count(*) AS n, CAST(count(DISTINCT custkey) AS BIGINT) AS n_keys FROM (
           SELECT o_custkey AS custkey, 'order' AS src FROM orders
           UNION ALL
           SELECT c_custkey AS custkey, 'customer' AS src FROM customer) t
         GROUP BY src ORDER BY src""",

    "q27_range_join" ->
      """SELECT s_suppkey, count(*) AS n_near
         FROM supplier JOIN customer ON c_acctbal BETWEEN s_acctbal-50 AND s_acctbal+50
         GROUP BY s_suppkey ORDER BY s_suppkey""",

    "q28_asof_last_view" ->
      """SELECT event_id, user_id, strftime(last_view, '%Y-%m-%d %H:%M:%S') AS last_view_s FROM (
           SELECT event_id, user_id, event_type,
             max(CASE WHEN event_type='view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
           FROM events) t
         WHERE event_type='purchase' ORDER BY event_id"""
  )
}
