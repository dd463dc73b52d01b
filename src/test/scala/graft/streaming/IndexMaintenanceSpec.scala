package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

/** Streaming IVF-PQ maintenance: micro-batch appends must land exactly
  * once (epoch ledger), the maintained index must equal a batch rebuild
  * at the frozen codebook (q126's equality device), and the mass report
  * must read the appended fraction off the directory alone.
  */
final case class VecRow(vec_id: Long, label: Long, e: Array[Double])

class IndexMaintenanceSpec extends SparkSpec {

  private def vec(id: Long): Array[Double] =
    Array.tabulate(64)(j => ((id % 10) * 2.0 + ((id * 13 + j * 7) % 11) / 11.0))

  private def frame(ids: Seq[Long]) = {
    val sp = spark
    graft.functions.VectorFunctions.register(sp)
    import sp.implicits._
    ids.map(i => VecRow(i, i % 10, vec(i))).toDF()
  }

  test("streamed appends land exactly once and equal a frozen-codebook rebuild") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val base = frame(0L until 60L)
    val dir = java.nio.file.Files.createTempDirectory("graft_idxmaint").toString
    SimilarityOps.saveIvfPqIndexFrom(base, dir)

    val input = MemoryStream[VecRow]
    val q = IndexMaintenance.ivfPqAppendSink(input.toDF(), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_idxmaint_ckpt").toString)
      .start()
    try {
      input.addData((60L until 70L).map(i => VecRow(i, i % 10, vec(i))): _*)
      q.processAllAvailable()
      input.addData((70L until 80L).map(i => VecRow(i, i % 10, vec(i))): _*)
      q.processAllAvailable()
    } finally q.stop()

    // maintained index == one-shot rebuild of the union at the SAME frozen
    // codebook (trained on base only): build the reference and compare the
    // full (cid, subspace, code) sets
    val refDir = java.nio.file.Files.createTempDirectory("graft_idxmaint_ref").toString
    SimilarityOps.saveIvfPqIndexFrom(base, refDir)
    SimilarityOps.appendToIvfPqIndex(sp, frame(60L until 80L), refDir)
    def codesOf(d: String) = sp.read.parquet(s"$d/codes")
      .select("cid", "subspace", "code").collect().map(_.toSeq).toSet
    val got = codesOf(dir)
    assert(got.map(_.head.asInstanceOf[Long]).size === 80)
    assert(got === codesOf(refDir), "maintained index diverged from the rebuild")

    // a REPLAYED epoch (foreachBatch's at-least-once contract) must be a
    // no-op: epoch 0 is in the ledger, so re-applying it changes nothing
    val replay = IndexMaintenance.appendEpoch(
      frame(60L until 70L), epoch = 0L, dir)
    assert(!replay, "replayed epoch was re-applied")
    assert(codesOf(dir) === got, "replay mutated the codes table")

    // the mass report reads base/appended split off the directory alone
    val rep = IndexMaintenance.appendedMassReport(sp, dir).collect()(0)
    assert(rep.getLong(0) === 60L && rep.getLong(1) === 20L)
    assert(rep.getDouble(2) === 0.25)
    assert(rep.getLong(3) === 0L, "0.25 appended mass is under the 0.3 bar")

    // push past the bar: one more epoch flips rebuild_mass
    assert(IndexMaintenance.appendEpoch(frame(80L until 95L), epoch = 2L, dir))
    val rep2 = IndexMaintenance.appendedMassReport(sp, dir).collect()(0)
    assert(rep2.getLong(1) === 35L && rep2.getLong(3) === 1L,
      s"0.368 appended mass must trip the 0.3 bar: $rep2")
    IndexMaintenance.releaseIvfPqLease(sp, dir)
    sp.catalog.clearCache()
  }

  test("a second concurrent maintainer fails by name; release recovers") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_idxlease").toString
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 20L), dir)
    val a = MemoryStream[VecRow]
    IndexMaintenance.ivfPqAppendSink(a.toDF(), dir) // claims the lease
    val b = MemoryStream[VecRow]
    val e = intercept[IllegalStateException] {
      IndexMaintenance.ivfPqAppendSink(b.toDF(), dir)
    }
    assert(e.getMessage.contains("single-writer lease"),
      s"second maintainer must fail by NAME, got: ${e.getMessage}")
    // crash recovery: explicit release, then a new maintainer attaches
    IndexMaintenance.releaseIvfPqLease(sp, dir)
    IndexMaintenance.ivfPqAppendSink(b.toDF(), dir)
    IndexMaintenance.releaseIvfPqLease(sp, dir)
  }

  test("a forced lease takeover stops the old maintainer by name") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_idxtake").toString
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 20L), dir)
    graft.operators.IvfPqIndexStore.acquireLease(sp, dir, "maintainer-b")
    val e = intercept[IllegalStateException] {
      IndexMaintenance.appendEpoch(frame(20L until 25L), epoch = 0L, dir,
        leaseToken = Some("maintainer-a"))
    }
    assert(e.getMessage.contains("lost the lease"))
    IndexMaintenance.releaseIvfPqLease(sp, dir)
  }

  test("replay detection survives the rebuild's ledger fold") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_idxfold").toString
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), dir)
    assert(IndexMaintenance.appendEpoch(frame(40L until 50L), epoch = 7L, dir))
    SimilarityOps.rebuildIvfPqIndexFrom(frame(0L until 50L), dir)
    // the fold carried epoch 7 into the new set: its replay is still a
    // no-op even though the new set's ledger has no per-cid rows for it
    val rdir = graft.operators.IvfPqIndexStore.resolveRead(sp, dir)
    assert(rdir.endsWith("index.v1"))
    assert(!IndexMaintenance.appendEpoch(frame(40L until 50L), epoch = 7L, dir),
      "a folded epoch must still be detected as applied")
    assert(sp.read.parquet(s"$rdir/codes").count() === 50L * 8,
      "the detected replay must not mutate the rebuilt codes table")
    // folded epochs carry no appended mass — the rebuild retrained them in
    val rep = IndexMaintenance.appendedMassReport(sp, dir).collect()(0)
    assert(rep.getLong(0) === 50L && rep.getLong(1) === 0L,
      s"post-rebuild mass must restart at zero appended: $rep")
    // the ledger is ONE compacted file after the fold (the tiny-file fix)
    val ledgerFiles = new java.io.File(s"$rdir/append_ledger")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(ledgerFiles === 1, s"folded ledger must be one file, got $ledgerFiles")
    // maintenance continues against the rebuilt set
    assert(IndexMaintenance.appendEpoch(frame(50L until 55L), epoch = 8L, dir))
    val rep2 = IndexMaintenance.appendedMassReport(sp, dir).collect()(0)
    assert(rep2.getLong(0) === 50L && rep2.getLong(1) === 5L)
  }

  test("ANN admission gate drops indexed near-dups and is SWAP-aware") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_anngate").toString
    // v0: the main corpus. The far cluster lives 100 units away under its
    // own labels — unindexed at v0, indexed by the mid-stream rebuild.
    def farVec(id: Long): Array[Double] = vec(id).map(_ + 100.0)
    val main = frame(0L until 40L)
    val far = (900L until 905L).map(i => VecRow(i, 10 + i % 2, farVec(i))).toDF()
    SimilarityOps.saveIvfPqIndexFrom(main, dir)

    // size the bar FROM the one-definition batch operator: between the
    // quantization distortion of an exact indexed copy and the distance
    // to a 100-unit-away outlier — the gate then must agree by identity
    def adistOf(qe: Array[Double]): Double =
      SimilarityOps.searchSavedIvfPqFor(
        Seq((9999L, qe)).toDF("qid", "qe"), dir, k = 1)
        .collect()(0).getAs[Double]("adist")
    val dNear = adistOf(vec(5))
    val dFar = adistOf(farVec(901))
    assert(dNear < dFar, s"fixture sanity: $dNear < $dFar")
    val bar = (dNear + dFar) / 2

    val admitted = scala.collection.mutable.Set[Long]()
    val input = MemoryStream[VecRow]
    val q = IndexMaintenance.annAdmissionSink(input.toDF(), dir, bar) {
      (df, _) => admitted ++= df.select("vec_id").collect().map(_.getLong(0))
    }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_anngate_ckpt").toString)
      .start()
    try {
      // trigger 1 against v0: the indexed copy drops, the outlier passes
      input.addData(VecRow(1000, 5, vec(5)), VecRow(2000, 10, farVec(901)))
      q.processAllAvailable()
      assert(admitted.toSet === Set(2000L),
        s"v0 trigger: near-dup dropped, outlier admitted — got $admitted")
      // mid-stream REBUILD indexes the far cluster and swaps atomically
      SimilarityOps.rebuildIvfPqIndexFrom(main.unionByName(far), dir)
      assert(adistOf(farVec(902)) < bar,
        "post-rebuild the far cluster quantizes within the bar")
      // trigger 2: a far-cluster copy is a near-dup ONLY under the
      // rebuilt set — dropping it proves the gate resolved the swap
      input.addData(VecRow(3000, 10, farVec(902)), VecRow(4000, 5, vec(7)))
      q.processAllAvailable()
      assert(admitted.toSet === Set(2000L),
        s"post-swap trigger must be served by the rebuilt set — got $admitted")
    } finally q.stop()
    sp.catalog.clearCache()
  }

  test("the FULL intake loop: admit novel, append, audit fires, rebuild, next copy drops") {
    // gate → maintainer → audit → rebuild → gate, end to end: a novel
    // far-cluster vector is admitted (nothing indexed is near it),
    // appended against the FROZEN base codebooks (which quantize it
    // terribly — exactly q127's staleness signal), the ledger-cohort
    // audit fires on distortion, the rebuild retrains it into its own
    // cell, and the next trigger's copy of it is DROPPED — near-dup
    // detection at the edge is only as good as the quantization, which
    // is precisely why the lifecycle's rebuild exists.
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_intakeloop").toString
    val base = frame(0L until 40L)
    SimilarityOps.saveIvfPqIndexFrom(base, dir)
    def farVec(id: Long): Array[Double] = vec(id).map(_ + 100.0)
    val novel = VecRow(900, 10, farVec(900))
    // bar = an exact indexed copy's quantization distortion: admits the
    // far novel vector (huge adist vs the v0 index), drops a retrained
    // exact copy (adist 0 in its own post-rebuild cell)
    val bar = SimilarityOps.searchSavedIvfPqFor(
      Seq((9999L, vec(5))).toDF("qid", "qe"), dir, k = 1)
      .collect()(0).getAs[Double]("adist")
    val admitted = scala.collection.mutable.Set[Long]()
    val input = MemoryStream[VecRow]
    val q = IndexMaintenance.annAdmissionSink(input.toDF(), dir, bar) {
      (df, epoch) =>
        admitted ++= df.select("vec_id").collect().map(_.getLong(0))
        // the chained maintainer: admitted vectors immediately claim
        // index state (the annAdmissionSink scaladoc's composition)
        IndexMaintenance.appendEpoch(df, epoch, dir): Unit
    }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_intakeloop_ckpt").toString)
      .start()
    try {
      input.addData(novel)
      q.processAllAvailable()
      assert(admitted.toSet === Set(900L), "novel far vector admitted")
      // the scheduled audit job: the appended cohort (from the ledger) is
      // quantized by codebooks trained before it existed — distortion
      // fires the rebuild even though its mass (1/41) is under the bar
      assert(SimilarityOps.rebuildIfStale(
        base.unionByName(Seq(novel).toDF()), dir),
        "the drifted append must actuate the rebuild")
      // next trigger: a COPY of the admitted vector — only detectable
      // because the rebuild retrained it into its own cell
      input.addData(VecRow(901, 10, farVec(900)))
      q.processAllAvailable()
      assert(admitted.toSet === Set(900L),
        "the retrained copy must be dropped at the gate")
    } finally q.stop()
    IndexMaintenance.releaseIvfPqLease(sp, dir)
    sp.catalog.clearCache()
  }

  test("re-delivered vec_ids never corrupt the mass arithmetic") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_idxredeliver").toString
    SimilarityOps.saveIvfPqIndexFrom(frame(0L until 40L), dir)
    assert(IndexMaintenance.appendEpoch(frame(40L until 50L), epoch = 1L, dir))
    // the source re-fires ids 45..49 under a NEW epoch (at-least-once
    // upstream, not a foreachBatch replay) alongside genuinely new ids —
    // the r13 ledger-sum arithmetic counted them twice (base_vecs could go
    // negative); distinct-cid algebra counts each vector once
    assert(IndexMaintenance.appendEpoch(frame(45L until 55L), epoch = 2L, dir))
    val rep = IndexMaintenance.appendedMassReport(sp, dir).collect()(0)
    assert(rep.getLong(0) === 40L, s"base must stay 40: $rep")
    assert(rep.getLong(1) === 15L, s"appended must be DISTINCT ids 40..54: $rep")
    assert(rep.getLong(0) >= 0L && rep.getDouble(2) <= 1.0)
  }
}
