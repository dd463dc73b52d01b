package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ClassifierOps, DedupOps, GraphOps, MultimodalOps, ReadstatQueries, Relational, ScaleOps, SimilarityOps, StatsOps, TextOps}
import graft.util.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (SURVEY.md §2): each entry is
  * checked against the DuckDB oracle in `oracleSql` at sf0.01 by the
  * driver's Verify run, and timed at sf0.1 by Bench.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape: filter → 3-way join → agg → top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_join3_topk")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ ReadstatQueries.queries ++ MultimodalOps.queries ++
      ScaleOps.queries ++ GraphOps.queries ++ StatsOps.queries ++
      ClassifierOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ DedupOps.oracle ++
      SimilarityOps.oracle ++ ReadstatQueries.oracle ++ MultimodalOps.oracle ++
      ScaleOps.oracle ++ GraphOps.oracle ++ StatsOps.oracle ++
      ClassifierOps.oracle
}
