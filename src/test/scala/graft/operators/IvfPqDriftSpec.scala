package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q127's rebuild policy on PLANTED drift: the staleness audit must flag a
  * rebuild when the appended cohort's distribution shifted away from the
  * frozen codebook's training data, and must NOT flag a same-distribution
  * append (q126's healthy case). The fixture keeps the appended fraction
  * under the 0.3 mass bar so only the distortion bar can flip the flag —
  * isolating the signal the test is about.
  */
class IvfPqDriftSpec extends SparkSpec {

  // 64-dim vectors with label-clustered structure (labels 0..9 feed the
  // 10-codeword PQ codebook): deterministic, no RNG
  private def vec(id: Long, drift: Double): Array[Double] =
    Array.tabulate(64)(j => ((id % 10) * 2.0 + ((id * 13 + j * 7) % 11) / 11.0 + drift))

  private def frame(ids: Seq[Long], drift: Double) = {
    val sp = spark
    graft.functions.VectorFunctions.register(sp)
    import sp.implicits._
    ids.map(i => (i, i % 10, vec(i, drift)))
      .toDF("vec_id", "label", "e")
      .withColumn("nrm", sqrt(expr("aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")))
  }

  test("q127: drifted append flips rebuild; healthy append does not; fraction bar isolated") {
    val base = frame(0L until 90L, 0.0)
    for ((drift, expectRebuild) <- Seq(0.0 -> 0L, 3.0 -> 1L)) {
      val batch = frame(90L until 100L, drift)
      val dir = java.nio.file.Files.createTempDirectory("graft_q127").toString
      SimilarityOps.saveIvfPqIndexFrom(base, dir)
      SimilarityOps.appendToIvfPqIndex(spark, batch, dir)
      val rows = SimilarityOps.ivfPqStalenessAuditFrom(
        base.unionByName(batch), dir, "vec_id >= 90",
        fracBar = 0.3, distBar = 1.5).collect()
      val byCohort = rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5))).toMap
      assert(byCohort.keySet === Set("build", "append"))
      val (aVecs, aRows, aFrac, aFlag) = byCohort("append")
      val (bVecs, bRows, _, bFlag) = byCohort("build")
      assert(aVecs === 10L && bVecs === 90L)
      assert(aRows === 80L && bRows === 720L, "8 subspace rows per vector")
      assert(aFrac === 0.1, "appended fraction below the 0.3 mass bar by construction")
      assert(aFlag === bFlag, "the rebuild flag is global, repeated per cohort row")
      assert(aFlag === expectRebuild,
        s"drift=$drift: expected rebuild=$expectRebuild, audit said $aFlag " +
          s"(rows: ${rows.mkString("; ")})")
    }
  }

  test("q127: the mass bar alone flips rebuild when the appended fraction crosses it") {
    val base = frame(0L until 50L, 0.0)
    val batch = frame(50L until 100L, 0.0) // same distribution, 50% of mass
    val dir = java.nio.file.Files.createTempDirectory("graft_q127m").toString
    SimilarityOps.saveIvfPqIndexFrom(base, dir)
    SimilarityOps.appendToIvfPqIndex(spark, batch, dir)
    val rows = SimilarityOps.ivfPqStalenessAuditFrom(
      base.unionByName(batch), dir, "vec_id >= 50",
      fracBar = 0.3, distBar = 1.5).collect()
    assert(rows.forall(_.getLong(5) === 1L),
      s"0.5 appended mass must trip the 0.3 bar: ${rows.mkString("; ")}")
  }
}
