package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q46 grouped percentiles, q47 deterministic stratified sampling, q48
  * TF-IDF: properties beyond the hash oracle — monotone quantiles, rates
  * that concentrate at the configured strata quotas, run-to-run
  * determinism (the whole point of hash-threshold sampling vs rand()).
  */
class StatsOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("q46 percentiles are monotone and group counts cover the table") {
    val rows = StatsOps.queries("q46_group_percentiles")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p90, p99) = Seq(2, 3, 4, 5).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99, s"non-monotone: $r")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total === spark.read.parquet(s"$d/lineitem.parquet").count())
  }

  test("approx_percentile (the 100 TB path) tracks q46's exact percentiles") {
    // q46 is exact so the DuckDB oracle can hash-match; at scale the
    // operator of choice is approx_percentile (mergeable sketch, map-side
    // partials). Pin the substitution's error the same way q26 pins HLL:
    // within 1% of the exact value at the default accuracy.
    val exact = StatsOps.queries("q46_group_percentiles")(spark, d)
      .collect().map(r => r.getString(0) -> Seq(2, 3, 4, 5).map(r.getDouble)).toMap
    val approx = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D, 0.99D))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((flag, ps) <- exact; (e, a) <- ps.zip(approx(flag)))
      assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
  }

  test("q47 strata rates concentrate at 25% (even sources) and 75% (odd)") {
    val sample = StatsOps.queries("q47_stratified_sample")(spark, d)
      .withColumn("srcnum", substring(col("source"), 4, 10).cast("int"))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("srcnum", substring(col("source"), 4, 10).cast("int"))
    val perStratum = docs.groupBy(col("srcnum") % 2).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = sample.groupBy(col("srcnum") % 2).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val evenRate = kept(0).toDouble / perStratum(0)
    val oddRate = kept(1).toDouble / perStratum(1)
    // 250 docs per parity at sf0.01: ±3σ of Binomial(250, p)
    assert(math.abs(evenRate - 0.25) < 0.09, s"even rate $evenRate")
    assert(math.abs(oddRate - 0.75) < 0.09, s"odd rate $oddRate")
  }

  test("q47 is bit-identical across runs (no rand() anywhere)") {
    def run() = StatsOps.queries("q47_stratified_sample")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("q57 packing invariants: contiguous bins, no bin starts past capacity, order preserved") {
    val rows = StatsOps.queries("q57_pack_sequences")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((src, docs) <- rows.groupBy(_._2)) {
      val inOrder = docs.sortBy(_._1)
      // bin ids start at 0, never decrease, never skip
      val bins = inOrder.map(_._4)
      assert(bins.head === 0L, s"$src first bin")
      bins.zip(bins.tail).foreach { case (a, b) =>
        assert(b === a || b === a + 1, s"$src bins skipped: $a -> $b")
      }
      // independent recomputation of the greedy-fill rule: a doc's bin is
      // the capacity-quotient of the tokens packed before it
      var before = 0L
      inOrder.foreach { case (id, _, n, b) =>
        assert(b === before / StatsOps.packCapacity, s"$src doc $id bin")
        before += n
      }
    }
  }

  test("q48 returns exactly 20 rows with non-increasing scores and the smoothed formula") {
    val rows = TextOps.queries("q48_tfidf")(spark, d).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores not sorted")
    // recompute the winner's score independently from raw counts
    val top = rows.head
    val (docId, w, tf) = (top.getLong(0), top.getString(1), top.getLong(2))
    val tok = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    val tfChk = tok.filter(col("doc_id") === docId && col("w") === w).count()
    val dfChk = tok.filter(col("w") === w).select("doc_id").distinct().count()
    assert(tfChk === tf)
    val expected = BigDecimal(tf * (math.log((n + 1.0) / (dfChk + 1.0)) + 1.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(3) === expected)
  }
}
