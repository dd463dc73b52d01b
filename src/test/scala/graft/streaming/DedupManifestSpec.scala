package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupOps

/** The incremental dedup manifest: manifest-served delta verdicts must be
  * byte-identical to batch q112's per-batch recompute, streamed appends
  * land exactly once, verdicts survive a compaction swap unchanged, and
  * the single-writer lease fails a second maintainer by name.
  */
final case class ManifestDoc(doc_id: Long, text: String)

class DedupManifestSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("manifest-served delta dedup equals the per-batch recompute exactly") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_eq").toString
    DedupManifest.initManifest(docs.filter(col("doc_id") % 10 < 8), dir)
    val served = DedupManifest.deltaDedupAgainstManifest(
      docs.filter(col("doc_id") % 10 >= 8), dir, docs)
    val batch = DedupOps.queries("q112_delta_dedup")(spark, d)
    assert(rows(served) === rows(batch))
  }

  test("streamed appends land exactly once; manifest equals a batch recompute") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    def doc(i: Long) = ManifestDoc(i,
      (0 until 30).map(j => s"w${(i * 17 + j * 5) % 800}").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_st").toString
    DedupManifest.initManifest((0L until 30L).map(doc).toDF(), dir)

    val input = MemoryStream[ManifestDoc]
    val q = DedupManifest.manifestAppendSink(input.toDF(), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_manifest_ck").toString)
      .start()
    try {
      input.addData((30L until 40L).map(doc): _*)
      q.processAllAvailable()
      input.addData((40L until 50L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    // the maintained tables equal a one-shot recompute over the union
    val all = (0L until 50L).map(doc).toDF()
    val expectFp = DedupOps.historyFpTable(all).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotFp = DedupManifest.manifestFp(sp, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotFp === expectFp)
    val expectBands = DedupOps.historyBandTable(all).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val gotBands = DedupManifest.manifestBands(sp, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotBands === expectBands)

    // replayed epoch is a no-op (foreachBatch's at-least-once contract)
    val nFp = sp.read.parquet(s"$dir/fp").count()
    assert(!DedupManifest.appendEpoch((30L until 40L).map(doc).toDF(), 0L, dir))
    assert(sp.read.parquet(s"$dir/fp").count() === nFp, "replay mutated fp table")

    // compaction: verdicts identical through the swap, epochs still
    // replay-detected across the fold, tables coalesced
    val arrivals = (100L until 110L).map(doc).toDF()
    val verify = all.unionByName(arrivals)
    val before = rows(DedupManifest.deltaDedupAgainstManifest(arrivals, dir, verify))
    // operational sequence: maintainer stopped above — release its lease,
    // then compact (the compaction claims the lease itself)
    DedupManifest.releaseManifestLease(sp, dir)
    DedupManifest.compactManifest(sp, dir)
    assert(graft.operators.IvfPqIndexStore.resolveRead(sp, dir).contains("index.v"),
      "compaction must commit a versioned set")
    val after = rows(DedupManifest.deltaDedupAgainstManifest(arrivals, dir, verify))
    assert(after === before, "verdicts changed through the compaction swap")
    assert(!DedupManifest.appendEpoch((30L until 40L).map(doc).toDF(), 0L, dir),
      "folded epoch no longer replay-detected")
    // fp table folded to one min row per fingerprint
    val rdir = graft.operators.IvfPqIndexStore.resolveRead(sp, dir)
    val fpRows = sp.read.parquet(s"$rdir/fp")
    assert(fpRows.count() === fpRows.select("fp").distinct().count())
    DedupManifest.releaseManifestLease(sp, dir)
  }

  test("auto-compaction fires on the epoch-backlog bar and converges") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    def doc(i: Long) = ManifestDoc(i,
      (0 until 30).map(j => s"w${(i * 17 + j * 5) % 800}").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_ac").toString
    DedupManifest.initManifest((0L until 30L).map(doc).toDF(), dir)

    val input = MemoryStream[ManifestDoc]
    // bar = 2: the sink's second applied epoch must actuate the compaction
    // itself, under its own lease, between triggers
    val q = DedupManifest.manifestAppendSink(input.toDF(), dir,
      autoCompactEpochs = 2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_manifest_ac_ck").toString)
      .start()
    try {
      input.addData((30L until 40L).map(doc): _*)
      q.processAllAvailable()
      assert(graft.operators.IvfPqIndexStore.committedVersion(sp, dir) === 0L,
        "one epoch is under the bar — no compaction yet")
      input.addData((40L until 50L).map(doc): _*)
      q.processAllAvailable()
      assert(graft.operators.IvfPqIndexStore.committedVersion(sp, dir) === 1L,
        "the second applied epoch must trip the bar and swap in v1")
      // the sink keeps appending across its own compaction swap
      input.addData((50L until 60L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()
    DedupManifest.releaseManifestLease(sp, dir)

    // the maintained tables survived the mid-stream swap: equal to a
    // one-shot recompute over the union — verdict identity by table
    // identity
    val all = (0L until 60L).map(doc).toDF()
    val expectFp = DedupOps.historyFpTable(all).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotFp = DedupManifest.manifestFp(sp, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotFp === expectFp, "manifest fp map diverged across the auto-swap")

    // convergence: the post-swap backlog is ONE unfolded epoch (the
    // append after the compaction) — under bar 2 the trigger no-ops,
    // at bar 1 it compacts once more, after which even bar 1 no-ops
    assert(!DedupManifest.compactIfOversized(sp, dir, maxUnfoldedEpochs = 2))
    assert(DedupManifest.compactIfOversized(sp, dir, maxUnfoldedEpochs = 1))
    assert(graft.operators.IvfPqIndexStore.committedVersion(sp, dir) === 2L)
    assert(!DedupManifest.compactIfOversized(sp, dir, maxUnfoldedEpochs = 1),
      "a fresh compaction folds every epoch — the loop must converge")
  }

  test("the TEXT intake loop: gated keepers feed the manifest; the manifest flags the next dump") {
    // the text-side analog of the index intake loop (IntakeToSinkSpec /
    // IndexMaintenanceSpec's full-loop test): documents stream through
    // the quality + cross-batch fingerprint gates, the ADMITTED keepers
    // maintain the dedup manifest per trigger, and the NEXT day's batch
    // is delta-deduped against the manifest — every stage is the
    // spec-pinned unit; this pins the composition.
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val good = (0 until 80).map(j => s"tok${j % 40} body").mkString(" ")
    def doc(i: Long, text: String) = ManifestDoc(i, text)
    val dir = java.nio.file.Files.createTempDirectory("graft_txt_loop").toString
    DedupManifest.initManifest(Seq.empty[ManifestDoc].toDF(), dir)

    val input = MemoryStream[ManifestDoc]
    val gated = DocStreams.dedupDocs(
      input.toDF().withColumn("ingest_ts",
        org.apache.spark.sql.functions.expr(
          "timestamp_seconds(1700000000 + doc_id)")))
    val q = DedupManifest.manifestAppendSink(
      gated.select("doc_id", "text"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_txt_loop_ck").toString)
      .outputMode("update")
      .start()
    try {
      input.addData(doc(1L, good + " alpha"), doc(2L, good + " beta"),
        doc(3L, good + " alpha")) // 3 = same-fingerprint dup of 1, gated out
      q.processAllAvailable()
    } finally q.stop()

    // the manifest holds exactly the admitted keepers (the gate keeps ONE
    // of the same-fingerprint pair {1, 3} — within-batch winner is not
    // contractual — plus 2)
    val kept = DedupManifest.manifestFp(sp, dir).collect()
      .map(_.getLong(1)).toSet
    assert(kept.contains(2L) && kept.size == 2 &&
      (kept - 2L).subsetOf(Set(1L, 3L)), s"manifest keepers, got $kept")
    val alphaKeeper = (kept - 2L).head

    // next dump delta-deduped AGAINST THE MANIFEST: an exact copy of a
    // keeper, a near-dup (same body, one tail token differs), a fresh doc
    val arrivals = Seq(
      doc(10L, good + " alpha"),                    // exact dup of keeper 1
      doc(11L, good + " gamma"),                    // near-dup (body shared)
      doc(12L, (0 until 80).map(j => s"other${j % 37} text").mkString(" ")))
      .toDF()
    // covers BOTH possible alpha keepers — the verify stage re-shingles
    // candidate ids from the corpus, so the winner's text must be present
    val verify = Seq(doc(1L, good + " alpha"), doc(2L, good + " beta"),
      doc(3L, good + " alpha"))
      .toDF().unionByName(arrivals)
    val verdicts = DedupManifest.deltaDedupAgainstManifest(arrivals, dir, verify)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(verdicts(10L) === (("exact_dup", alphaKeeper)))
    assert(verdicts(11L)._1 === "near_dup")
    assert(verdicts(12L) === (("new", -1L)))
    DedupManifest.releaseManifestLease(sp, dir)
  }

  test("a second maintainer on the same manifest fails by name") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_ls").toString
    DedupManifest.initManifest(
      Seq(ManifestDoc(1L, "a b c d e f")).toDF(), dir)
    val inputA = MemoryStream[ManifestDoc]
    DedupManifest.manifestAppendSink(inputA.toDF(), dir)
    val inputB = MemoryStream[ManifestDoc]
    val e = intercept[IllegalStateException] {
      DedupManifest.manifestAppendSink(inputB.toDF(), dir)
    }
    assert(e.getMessage.contains("dedup-manifest single-writer lease"))
    DedupManifest.releaseManifestLease(sp, dir)
  }
}
