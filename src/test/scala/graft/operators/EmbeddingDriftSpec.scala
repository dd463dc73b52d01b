package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q141 cohort drift: the null fixture split must read clean (shift at its
  * own sampling-noise floor, drift 0 everywhere), a genuinely TRANSLATED
  * cohort must fire the shift detector with the dispersion ratio staying
  * quiet, and a SCALED cohort must fire the ratio with the shift staying
  * under 3× noise — the two detectors are orthogonal by construction.
  */
class EmbeddingDriftSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("null split: drift 0 on every row, shift sits at its noise floor") {
    val out = SimilarityOps.queries("q141_embedding_drift")(spark, d).collect()
    assert(out.length === 11, "10 label rows + the pooled row")
    out.foreach { r =>
      assert(r.getLong(7) === 0L, s"null split flagged drift at label ${r.getLong(0)}")
      val (shift, noise) = (r.getDouble(4), r.getDouble(5))
      // E-shift under the null IS the floor; band [0.5x, 2x] is generous
      // for 64-dim concentration
      assert(shift > 0.5 * noise && shift < 2.0 * noise,
        f"label ${r.getLong(0)} shift $shift%.3f vs noise floor $noise%.3f " +
          "outside the null band")
    }
    val pooled = out.filter(_.getLong(0) == -1L)(0)
    assert(pooled.getLong(1) + pooled.getLong(2) === 500L)
    assert(pooled.getLong(2) === 125L, "vec_id % 4 = 3 is a quarter")
  }

  test("translated cohort fires the shift detector only; scaled fires the ratio only") {
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("arr", lit(0L))
    // translation: +1.5 in dim 0 — moves the mean, leaves variance alone;
    // sized past the per-label 3x noise floor (~1.0 at n~50 cohorts)
    val translated = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("embedding", expr(
        """transform(CAST(embedding AS ARRAY<DOUBLE>),
          |  (x, i) -> CAST(IF(i = 0, x + 1.5D, x) AS FLOAT))""".stripMargin))
      .withColumn("arr", lit(1L))
    val shifted = SimilarityOps.embeddingDriftFrom(base.unionByName(translated))
      .collect()
    shifted.foreach { r =>
      assert(r.getLong(7) === 1L, s"translated cohort not flagged at ${r.getLong(0)}")
      assert(r.getDouble(4) > 3.0 * r.getDouble(5), "shift must clear 3x noise")
      assert(r.getDouble(6) > 0.5 && r.getDouble(6) < 2.0,
        "translation must not move the dispersion ratio")
      assert(math.abs(r.getDouble(4) - 1.5) < 0.1,
        f"shift should be ~1.5, got ${r.getDouble(4)}%.3f")
    }
    // scaling: x2 everywhere — variance x4, mean also doubles (so shift
    // fires too on non-centered data); the RATIO detector is the claim
    val scaled = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("embedding", expr(
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(x * 2.0D AS FLOAT))"))
      .withColumn("arr", lit(1L))
    val ratioed = SimilarityOps.embeddingDriftFrom(base.unionByName(scaled))
      .collect()
    ratioed.foreach { r =>
      assert(r.getLong(7) === 1L, s"scaled cohort not flagged at ${r.getLong(0)}")
      assert(math.abs(r.getDouble(6) - 4.0) < 0.3,
        f"dispersion ratio should be ~4, got ${r.getDouble(6)}%.3f")
    }
  }

  test("a label present in only one cohort gets its own unconditionally flagged row") {
    // a brand-new label arriving is the loudest drift there is; the full
    // outer (lbl, pos) join must keep it (r14 review: an inner join
    // dropped it silently)
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("arr", lit(0L))
    val newLabel = spark.read.parquet(s"$d/embeddings.parquet")
      .limit(20)
      .withColumn("label", lit(99))
      .withColumn("arr", lit(1L))
    val out = SimilarityOps.embeddingDriftFrom(base.unionByName(newLabel))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.contains(99L), "arr-only label missing from the report")
    val row = out(99L)
    assert(row.getLong(1) === 0L && row.getLong(2) === 20L)
    assert(row.isNullAt(4) && row.isNullAt(5) && row.isNullAt(6),
      "one-sided label must carry NULL shift/noise/ratio (no comparison exists)")
    assert(row.getLong(7) === 1L, "one-sided label must flag drift")
    assert(row.getDouble(3) === 1.0, "arr_share of an arr-only label is 1")
    // arrivals exist ONLY for label 99 in this frame, so labels 0-9 are
    // base-only — the vanished-arrivals side of the same one-sided rule
    (0L to 9L).foreach { l =>
      assert(out(l).getLong(2) === 0L && out(l).getLong(7) === 1L,
        s"label $l should read as arrivals-vanished (n_arr 0, drift 1)")
    }
  }
}
