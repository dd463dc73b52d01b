package graft.operators

import graft.SparkSpec
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** r17 focused pins for the kept entry widens (guide §2.5 applied to the
  * single-row-group driver fixtures) and their safety claims:
  *
  *  1. `Tables.widenSmall` mechanics — widens a byte-tiny narrow frame to
  *     the session fan width, and NO-OPS when the frame already has that
  *     many splits (the r16 ADVICE double guard: the lake-scale no-op must
  *     be structural, not stats-dependent).
  *  2. Partition-invariance of every operator that kept its widen — the
  *     order-safety argument (integer counts/MINs or integerized
  *     fixed-point devices; for rpLsh, per-group rows derive from one
  *     input row) says re-grouping the map side cannot change a single
  *     output value. Pin it: the same operator over a 1-partition and an
  *     8-partition copy of the same input must return identical row sets,
  *     VALUES INCLUDED.
  */
class WidenInvarianceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def docs: DataFrame = Tables.documents(spark, d)

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertInvariant(op: DataFrame => DataFrame): Unit = {
    val narrow = rowSet(op(docs.coalesce(1)))
    val wide = rowSet(op(docs.repartition(8)))
    assert(narrow == wide,
      s"operator output changed with input partitioning: " +
        s"${(narrow diff wide).take(3)} vs ${(wide diff narrow).take(3)}")
  }

  test("widenSmall widens a byte-tiny 1-partition frame to fanWidth") {
    val tiny = docs.select("doc_id").coalesce(1)
    assert(tiny.rdd.getNumPartitions == 1)
    val widened = Tables.widenSmall(tiny)
    assert(widened.rdd.getNumPartitions == Tables.fanWidth(spark))
    assert(rowSet(widened) == rowSet(tiny))
  }

  test("widenSmall no-ops when the frame already has >= fanWidth splits") {
    val width = Tables.fanWidth(spark)
    val wide = docs.select("doc_id").repartition(width + 2)
    // the double guard: small size estimate alone must NOT trigger the
    // exchange when the scan already has enough natural splits
    assert(Tables.widenSmall(wide) eq wide)
  }

  test("q110 sourceDivergence is partition-invariant (nano-bit device)") {
    assertInvariant(StatsOps.sourceDivergence)
  }

  test("q71/q75 window operators are partition-invariant (count aggs)") {
    assertInvariant(df => DedupOps.windowDedup(df))
    assertInvariant(df => DedupOps.boilerplateFrac(df))
  }

  test("q90 sourceOverlap is partition-invariant (integer half-up)") {
    assertInvariant(DedupOps.sourceOverlap)
  }

  test("q44 rpLshNearDup is partition-invariant (per-row group argument)") {
    graft.functions.VectorFunctions.register(spark)
    val base = Tables.embeddings(spark, d)
      .withColumn("e", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm",
        org.apache.spark.sql.functions.sqrt(expr("graft_dot(e, e)")))
      .select(col("vec_id"), col("e"), col("nrm"))
    val narrow = rowSet(SimilarityOps.rpLshNearDup(spark, base.coalesce(1), L = 6, b = 8))
    val wide = rowSet(SimilarityOps.rpLshNearDup(spark, base.repartition(8), L = 6, b = 8))
    assert(narrow == wide)
  }
}
