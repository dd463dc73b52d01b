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
    sp.catalog.clearCache()
  }
}
