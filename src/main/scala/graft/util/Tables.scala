package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All graft queries take `(spark, sfDir)` and read these tables; at 100 TB
  * scale the same code reads a directory of many parquet files — Spark's
  * parquet source handles splits, predicate pushdown and column pruning
  * identically for 1 file or 100k files.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan width for compute-bound, byte-tiny stages (the PairBuckets and
    * verify-join explicit repartitions): the session's configured reducer
    * count, floored at the scheduling width. Replaces the hard-coded
    * `defaultParallelism * 4` (r16): the ×4 was tuned for the smoke's
    * multi-wave schedule but taxed the sf-scale bench with three
    * 128-partition exchanges of kilobyte rows per pair stage (~1–2 s of
    * pure task scheduling per invocation). The smoke session already opts
    * into `shuffle.partitions = 4 × cores` — its multi-wave shape is
    * unchanged — the bench keeps `= cores`, and a production deployment
    * sets its own reducer count: the session config IS the scale knob
    * (guide §2, partitioning derived from the deployment rather than a
    * constant tuned for either local mode or the cluster).
    */
  def fanWidth(s: SparkSession): Int =
    math.max(s.sparkContext.defaultParallelism,
      s.sessionState.conf.numShufflePartitions)

  /** Widen a byte-tiny, compute-heavy frame to [[fanWidth]] partitions —
    * the targeted form of guide §2.5's "repartition immediately after the
    * read". The driver fixtures are single-row-group parquet files, so a
    * projection chain above them (fingerprint regex+md5, shingle sha256)
    * runs as ONE task however many cores the session has; one round-robin
    * exchange of the kilobyte rows spreads it. Guarded by the optimizer's
    * size ESTIMATE so it is a no-op at lake scale, where the same
    * repartition would be a full corpus shuffle (a lake table's stats are
    * file-sized and blow the bar; its scan already has thousands of
    * natural splits). Only sound above float-free derivations (digests,
    * integer mins) — a re-grouped map side can move a double sum across a
    * rounding boundary (measured on q20; see OPTIMIZATION_r16.md).
    */
  def widenSmall(df: DataFrame, barBytes: Long = 64L << 20): DataFrame = {
    val est = try df.queryExecution.optimizedPlan.stats.sizeInBytes
              catch { case scala.util.control.NonFatal(_) => return df }
    val width = fanWidth(df.sparkSession)
    // double guard (r16 ADVICE): the size estimate alone can underestimate
    // a pruned projection over a genuinely large table — but such a table's
    // scan already has >= width natural splits, so requiring BOTH a small
    // estimate AND a narrow split count makes the lake-scale no-op claim
    // structural rather than stats-dependent (and skips the pointless
    // exchange when the frame is already wide enough).
    val nPart = try df.rdd.getNumPartitions
                catch { case scala.util.control.NonFatal(_) => return df }
    // SEVERE under-split only (r17 smoke adjudication): `nPart < width`
    // fired on the 10×–50× smoke corpora too (25–50 natural splits vs a
    // 128-wide session), and the corpus-wide round-robin exchange it
    // inserted cost far more than the marginal balance it bought —
    // q71 ×3.9, q75 ×3.5, q90 ×2.8, q74 ×4.9 at the 10× tier. A scan
    // with ≥ width/4 splits already keeps the session busy (≤4 cores per
    // split); the widen exists for the PATHOLOGICALLY narrow case — the
    // sf fixtures' single row group — where it measured ×0.5–0.8.
    if (est >= 0 && est <= barBytes && nPart * 4L <= width) df.repartition(width)
    else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench).
    * We keep ts as exact nanosecond longs — integer ordering and gap
    * arithmetic are then bit-identical to the oracle's nanosecond
    * timestamps, with conversion to timestamp only for display.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
    }
  }

  /** Nano-long column → timestamp (µs precision) for formatting. Integer
    * DIV, not `/`: double division would lose precision above 2^53 ns.
    */
  def tsFromNanos(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"timestamp_micros($name DIV 1000)")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
