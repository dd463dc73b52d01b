package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVF-PQ rebuild-and-swap lifecycle (q133, the r13 verdict's top
  * item): the rebuild must equal a fresh build on results, commit with one
  * atomic marker (readers never see a half-swapped set), survive a crash
  * at every pre-marker point, compact the append crash-window's duplicate
  * code rows, carry replay detection across the ledger fold, and retire
  * old sets on the retention schedule.
  */
final case class LcVec(vec_id: Long, label: Long, e: Array[Double])

class IndexLifecycleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def vec(id: Long): Array[Double] =
    Array.tabulate(64)(j => ((id % 10) * 2.0 + ((id * 13 + j * 7) % 11) / 11.0))

  private def frame(ids: Seq[Long]) = {
    val sp = spark
    graft.functions.VectorFunctions.register(sp)
    import sp.implicits._
    ids.map(i => LcVec(i, i % 10, vec(i))).toDF()
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lc_$tag").toString

  private def codesOf(dir: String) =
    spark.read.parquet(s"${IvfPqIndexStore.resolveRead(spark, dir)}/codes")

  test("rebuilt index searches exactly like a fresh full-corpus build") {
    graft.functions.VectorFunctions.register(spark)
    // lifecycle dir: stale build on ids 0..59, append 60..79, rebuild union
    val lifecycle = tmp("cycle")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 60L), lifecycle)
    SimilarityOps.appendToIvfPqIndex(spark, frame(60L until 80L), lifecycle)
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 80L), lifecycle)
    // fresh dir: one-shot build over the same union
    val fresh = tmp("fresh")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 80L), fresh)
    def table(dir: String, name: String) = spark.read
      .parquet(s"${IvfPqIndexStore.resolveRead(spark, dir)}/$name")
    // the rebuilt set IS a fresh build: centroids, codebook and codes all
    // agree as sets (same rows, independent of file layout)
    for (t <- Seq("centroids", "codebook", "codes")) {
      val a = table(lifecycle, t)
      val b = table(fresh, t).select(a.columns.map(col): _*)
      assert(a.collect().map(_.toSeq).toSet === b.collect().map(_.toSeq).toSet,
        s"rebuilt $t diverged from a fresh build")
    }
    assert(IvfPqIndexStore.committedVersion(spark, lifecycle) === 1L)
    assert(IvfPqIndexStore.committedVersion(spark, fresh) === 0L)
  }

  test("q133's rebuilt search equals q122's fresh-build search (shared oracle)") {
    // the two queries share q70's oracle text verbatim; this pins the
    // claim on the real fixture corpus end to end — stale build, drifted
    // append, atomic rebuild, then search ≡ fresh full-corpus build+search
    val rebuilt = SimilarityOps.queries("q133_ivfpq_rebuild_search")(spark, d)
      .collect().map(_.toSeq).toSet
    val freshly = SimilarityOps.queries("q122_ivfpq_saved_search")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(rebuilt === freshly)
    spark.catalog.clearCache()
  }

  test("uncommitted staging is invisible; the marker create is the swap") {
    graft.functions.VectorFunctions.register(spark)
    val dir = tmp("swap")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), dir)
    val v0 = IvfPqIndexStore.resolveRead(spark, dir)
    assert(v0 === dir, "flat layout must resolve to the directory itself")

    // simulate every pre-marker crash point at once: a COMPLETE staged set
    // (worst case — all files present, marker absent) must not be resolved
    val staged = s"$dir/index.v1"
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 50L), staged)
    assert(IvfPqIndexStore.resolveRead(spark, dir) === dir,
      "reader resolved an uncommitted staging set")
    val before = codesOf(dir).count()
    assert(before === 40L * 8, "pre-swap reads must see the old set intact")

    // the one-marker commit flips resolution atomically
    IvfPqIndexStore.commit(spark, staged)
    assert(IvfPqIndexStore.resolveRead(spark, dir) === staged)
    assert(codesOf(dir).count() === 50L * 8)

    // a rebuild after a crashed attempt skips PAST the orphan staging dir
    // (never reuses a directory a reader could be probing) and the prune
    // sweeps the orphan away
    val orphan = s"$dir/index.v2"
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 10L), orphan)
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 60L), dir)
    assert(IvfPqIndexStore.committedVersion(spark, dir) === 3L)
    assert(codesOf(dir).count() === 60L * 8)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(orphan)),
      "the crashed attempt's uncommitted staging dir must be swept")
  }

  test("rebuild compacts duplicate code rows from the append crash window") {
    graft.functions.VectorFunctions.register(spark)
    val dir = tmp("dups")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), dir)
    // the crash window: codes appended, ledger write lost, epoch replayed
    SimilarityOps.appendToIvfPqIndex(spark, frame(40L until 50L), dir)
    SimilarityOps.appendToIvfPqIndex(spark, frame(40L until 50L), dir)
    val dupes = codesOf(dir).groupBy("cid", "subspace")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupes === 10L * 8, "fixture must actually plant duplicate rows")
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 50L), dir)
    val after = codesOf(dir).groupBy("cid", "subspace")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(after === 0L, "rebuild must compact the duplicate code rows")
    assert(codesOf(dir).count() === 50L * 8)
  }

  test("replay crash window stamps dup exposure; audit stays tolerant there, dedup-free on clean sets") {
    graft.functions.VectorFunctions.register(spark)
    // clean set: build + one COMPLETED epoch append — no exposure, so the
    // audit takes the fast path (no full-table dedup exchange)
    val clean = tmp("cleanset")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), clean)
    assert(graft.streaming.IndexMaintenance.appendEpoch(frame(40L until 50L), 1L, clean))
    assert(!IvfPqIndexStore.dupsPossible(spark, clean),
      "a completed append must not stamp dup exposure")
    // crashed set: same rows, but epoch 1's first attempt dies BETWEEN the
    // codes append and the ledger write — the only dup-creating window
    val crashed = tmp("crashset")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), crashed)
    val batch = frame(40L until 50L)
    intercept[RuntimeException] {
      IvfPqIndexStore.applyEpochOnce(batch, 1L, crashed, None, "IVF-PQ",
          "vec_id") { (b, rdir) =>
        SimilarityOps.appendToIvfPqIndexResolved(spark, b, rdir)
        throw new RuntimeException("simulated crash before the ledger write")
      }
    }
    assert(!IvfPqIndexStore.dupsPossible(spark, crashed),
      "exposure is stamped by the REPLAY that re-appends, not by the crash")
    assert(graft.streaming.IndexMaintenance.appendEpoch(batch, 1L, crashed),
      "the replay must re-apply the epoch (it never reached the ledger)")
    assert(IvfPqIndexStore.dupsPossible(spark, crashed),
      "a replay across the mid-window crash must stamp dup exposure")
    val dupes = codesOf(crashed).groupBy("cid", "subspace")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupes === 10L * 8, "the replay planted duplicate code rows")
    // duplicate tolerance pinned where it can matter: the dup-exposed
    // set's audit must equal the clean set's row for row
    val corpus = frame(0L until 50L)
    def audit(dir: String) = SimilarityOps.ivfPqStalenessAuditFrom(
      corpus, dir, "vec_id >= 40", 0.3, 1.5).collect().map(_.toSeq).toSeq
    assert(audit(crashed) === audit(clean),
      "dup-exposed audit must collapse duplicates and match the clean set")
    // crash AFTER the ledger write (stale marker on an applied epoch): the
    // replay is skipped, the marker is swept, and no exposure is stamped
    val fs = new org.apache.hadoop.fs.Path(clean)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(clean, "_inflight.e1"), true).close()
    assert(!graft.streaming.IndexMaintenance.appendEpoch(batch, 1L, clean),
      "epoch 1 is in the ledger — the replay must be skipped")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(clean, "_inflight.e1")),
      "a stale marker on an applied epoch must be swept, not escalated")
    assert(!IvfPqIndexStore.dupsPossible(spark, clean),
      "an applied epoch's stale marker is not dup exposure")
  }

  test("retention keeps one predecessor and prunes older sets") {
    graft.functions.VectorFunctions.register(spark)
    val dir = tmp("prune")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 20L), dir)
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 30L), dir) // v1: keep v0
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids")),
      "v0 is the immediate predecessor after the first rebuild — retained")
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 40L), dir) // v2: v0 ages out
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids")),
      "flat v0 files must age out once two versions past")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/index.v1")),
      "the immediate predecessor must survive for in-flight readers")
    assert(IvfPqIndexStore.resolveRead(spark, dir) === s"$dir/index.v2")
    // staleness audit + mass report read the current set through the same
    // resolution: both must work against the rebuilt layout
    val audit = SimilarityOps.ivfPqStalenessAuditFrom(
      frame(0L until 40L), dir,
      cohortFilter = "vec_id >= 40", fracBar = 0.3, distBar = 1.5)
    val arow = audit.collect()
    assert(arow.length === 1 && arow(0).getAs[String]("cohort") === "build",
      "rebuilt set has no append cohort yet")
    assert(arow(0).getAs[Long]("rebuild") === 0L)
    spark.catalog.clearCache()
  }

  test("rebuildIfStale closes the loop on the MASS bar: fire, actuate, clear") {
    graft.functions.VectorFunctions.register(spark)
    val dir = tmp("loopm")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 50L), dir)
    // the appended mass arrives through the LEDGER (the streaming path) —
    // 50% appended trips the 0.3 bar
    assert(graft.streaming.IndexMaintenance.appendEpoch(
      frame(50L until 100L), epoch = 1L, dir))
    val corpus = frame(0L until 100L)
    assert(SimilarityOps.rebuildIfStale(corpus, dir), "mass bar must actuate")
    assert(IvfPqIndexStore.committedVersion(spark, dir) === 1L)
    // the rebuild folded the ledger: the loop must converge, not re-fire
    assert(!SimilarityOps.rebuildIfStale(corpus, dir),
      "post-fold audit must be healthy by definition")
    assert(IvfPqIndexStore.committedVersion(spark, dir) === 1L)
  }

  test("rebuildIfStale closes the loop on the DISTORTION bar") {
    graft.functions.VectorFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    def dvec(id: Long, drift: Double): Array[Double] =
      Array.tabulate(64)(j =>
        ((id % 10) * 2.0 + ((id * 13 + j * 7) % 11) / 11.0 + drift))
    def dframe(ids: Seq[Long], drift: Double) =
      ids.map(i => LcVec(i, i % 10, dvec(i, drift))).toDF()
    val dir = tmp("loopd")
    val base = dframe(0L until 90L, 0.0)
    val batch = dframe(90L until 100L, 3.0) // 10% mass — under the bar
    SimilarityOps.saveIvfPqIndexFrom(base, dir)
    assert(graft.streaming.IndexMaintenance.appendEpoch(batch, epoch = 1L, dir))
    val corpus = base.unionByName(batch)
    assert(SimilarityOps.rebuildIfStale(corpus, dir),
      "drifted append under the mass bar must actuate via distortion")
    // folded: the drifted vectors are retrained base now — no append
    // cohort, so the loop converges even though they remain outliers
    assert(!SimilarityOps.rebuildIfStale(corpus, dir))
    assert(IvfPqIndexStore.committedVersion(spark, dir) === 1L)
    spark.catalog.clearCache()
  }

  test("rebuild refuses to run under an active maintainer lease") {
    graft.functions.VectorFunctions.register(spark)
    val dir = tmp("lease")
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 20L), dir)
    IvfPqIndexStore.acquireLease(spark, dir, "maintainer-a")
    val e = intercept[IllegalStateException] {
      SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 20L), dir)
    }
    assert(e.getMessage.contains("single-writer lease"))
    IvfPqIndexStore.releaseLease(spark, dir)
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 20L), dir)
    assert(IvfPqIndexStore.committedVersion(spark, dir) === 1L)
  }
}
