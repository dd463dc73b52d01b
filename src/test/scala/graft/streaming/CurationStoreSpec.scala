package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupOps, IvfPqIndexStore, MultimodalOps, TextOps}

/** The materialized curation-stage store (r15): served q128/q134 must
  * equal their recompute builders row for row, the rematerialize swap
  * must follow the q133 commit discipline, the streaming accounting sink
  * must maintain a log identical to the batch-built one, and the
  * single-writer lease must hold.
  */
class CurationStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cur_$tag").toString

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("served q128/q134 equal the recompute builders row for row") {
    val dir = tmp("serve")
    CurationStore.materialize(spark, d, dir)
    val v128 = rowSet(CurationStore.multimodalVerdictServed(spark, dir))
    val r128 = rowSet(MultimodalOps.multimodalVerdict(spark, d))
    assert(v128 === r128, "served q128 diverged from the recompute")
    val v134 = rowSet(CurationStore.keeperConsistencyServed(spark, dir))
    val r134 = rowSet(MultimodalOps.keeperConsistency(spark, d))
    assert(v134 === r134, "served q134 diverged from the recompute")
    // the keeper map read off the log is textKeeperMap exactly
    assert(rowSet(CurationStore.textKeeperMapServed(spark, dir)) ===
      rowSet(TextOps.textKeeperMap(spark.read.parquet(s"$d/documents.parquet"))),
      "log-derived keeper map diverged from textKeeperMap")
    spark.catalog.clearCache()
  }

  test("rematerialize swaps atomically; readers resolve the committed set") {
    val sp = spark
    import sp.implicits._
    val dir = tmp("swap")
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val mediaOf = () => MultimodalOps.mediaWaterfall(sp, d)
    CurationStore.materialize(sp, d, dir)
    val before = rowSet(CurationStore.multimodalVerdictServed(sp, dir))
    // rebuild over a SHRUNK corpus: the swap must serve the new rows
    val shrunk = docs.filter(col("doc_id") < 300)
    CurationStore.rematerialize(shrunk, mediaOf(), dir)
    assert(IvfPqIndexStore.committedVersion(sp, dir) === 1L)
    val after = rowSet(CurationStore.multimodalVerdictServed(sp, dir))
    assert(after !== before, "swap did not change what readers serve")
    assert(CurationStore.textLog(sp, dir)
      .agg(max("doc_id")).collect()(0).getLong(0) < 300L,
      "served log still carries pre-swap docs")
    // retention: the flat v0 set survives one rebuild for in-flight readers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/text_log")),
      "immediate predecessor must be retained")
    // the lease is released on exit — a subsequent maintainer can claim
    IvfPqIndexStore.acquireLease(sp, dir, "probe", CurationStore.What)
    IvfPqIndexStore.releaseLease(sp, dir)
    sp.catalog.clearCache()
  }

  test("streamed maintenance builds the same log as the batch builder") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val docs = sp.read.parquet(s"$d/documents.parquet")
    // the batch-built reference log
    val batchDir = tmp("batch")
    CurationStore.materialize(sp, d, batchDir)
    val want = rowSet(CurationStore.textLog(sp, batchDir))
    // stream the corpus in arrival order through the accounting sink with
    // persistTo — the WaterfallAccountingSpec setup, now also writing
    val evalDocs = docs.filter(col("doc_id") < 10)
    val grams = evalDocs
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(explode(array_distinct(expr(DedupOps.gram5ArrayExpr("t")))).as("g"))
      .distinct()
    val evalBloom = graft.functions.BloomFunctions.serialize(
      grams.stat.bloomFilter("g", math.max(grams.count(), 1L) * 8, 1e-9))
    val corpus = docs.filter(col("doc_id") >= 10)
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0)).map(r => WfDoc(r.getLong(0), r.getString(1)))
    val streamDir = tmp("stream")
    val input = MemoryStream[WfDoc]
    val q = DocStreams.waterfallAccountingSink(input.toDF(), evalBloom,
      persistTo = Some(streamDir)) { (_, _) => () }
      .option("checkpointLocation", tmp("ckpt"))
      .start()
    try corpus.grouped(corpus.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    CurationStore.releaseStoreLease(sp, streamDir)
    val got = rowSet(CurationStore.textLog(sp, streamDir))
    assert(got === want,
      "streamed log diverged from the batch-built one")
    // the restart reconciliation source: keeper fps = the batch election
    assert(rowSet(CurationStore.keeperFingerprints(sp, streamDir)) ===
      rowSet(CurationStore.keeperFingerprints(sp, batchDir)))
    sp.catalog.clearCache()
  }

  test("committed-only seed excludes a crashed epoch's un-ledgered rows") {
    val sp = spark
    import sp.implicits._
    val dir = tmp("committed")
    CurationStore.materialize(sp, d, dir)
    val baseFps = rowSet(CurationStore.keeperFingerprints(sp, dir))
    assert(baseFps.nonEmpty)
    // a COMMITTED streamed epoch (5): rows + ledger via the shared device
    val ep5 = Seq((9001L, "fp_committed", "kept", true))
      .toDF("doc_id", "fp", "stage", "keeper")
    assert(CurationStore.appendEpoch(ep5, 5L, dir, None))
    // a CRASHED epoch (7): rows land in text_log but the ledger write
    // never happens — exactly applyEpochOnce's one exposed window
    Seq((9002L, "fp_crashed", "kept", true, 7L))
      .toDF("doc_id", "fp", "stage", "keeper", "__epoch")
      .write.mode("append").parquet(s"$dir/text_log")
    val committed = rowSet(CurationStore.committedKeeperFingerprints(sp, dir).get)
    assert(committed.contains(Seq("fp_committed")),
      "a ledgered epoch's keeper must be in the seed")
    assert(!committed.contains(Seq("fp_crashed")),
      "an un-ledgered epoch's keeper leaked into the seed — its replay " +
        "would relabel its own docs dedup")
    assert(committed -- Seq(Seq("fp_committed")) === baseFps,
      "batch-built base keepers (epoch-less) must all be in the seed")
    // the full-log reconciliation source still sees the crashed row
    assert(rowSet(CurationStore.keeperFingerprints(sp, dir))
      .contains(Seq("fp_crashed")))
    // a second store that never ledgered epoch 5 demotes it from the seed
    val other = tmp("other_ledger")
    val committedBoth = rowSet(CurationStore.committedKeeperFingerprints(
      sp, dir, alsoCommittedIn = Seq(other)).get)
    assert(!committedBoth.contains(Seq("fp_committed")),
      "an epoch missing from a downstream store's ledger must not seed")
    assert(committedBoth === baseFps)
    sp.catalog.clearCache()
  }

  test("a second maintainer on the same store fails by name") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = tmp("lease")
    val bloom = graft.functions.BloomFunctions.serialize(
      org.apache.spark.util.sketch.BloomFilter.create(10, 0.01))
    val input = MemoryStream[WfDoc]
    DocStreams.waterfallAccountingSink(input.toDF(), bloom,
      persistTo = Some(dir)) { (_, _) => () }
    val e = intercept[IllegalStateException] {
      DocStreams.waterfallAccountingSink(input.toDF(), bloom,
        persistTo = Some(dir)) { (_, _) => () }
    }
    assert(e.getMessage.contains("curation-store"))
    CurationStore.releaseStoreLease(sp, dir)
  }
}
