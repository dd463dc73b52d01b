package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{DedupOps, IvfPqIndexStore}

/** INCREMENTAL DEDUP MANIFEST — the scale story q112's scaladoc promised
  * made real: "history contributes one linear fingerprint aggregation and
  * one linear band table (both indexable/incremental in a real lake)".
  * Until now every delta-dedup batch RECOMPUTED those two tables from the
  * full history corpus — linear, but linear in 100 TB, every day. This
  * store maintains them incrementally at the ingest edge, so a daily dump
  * pays |batch| fingerprint/minhash work instead of |history|, and the
  * delta verdicts are IDENTICAL (spec-pinned ≡ batch q112; q143's oracle
  * pins it against q112's own SQL text verbatim — the q122/q133
  * one-oracle-text discipline).
  *
  * == Layout (the [[graft.operators.IvfPqIndexStore]] disciplines, reused
  * verbatim) ==
  *
  * {{{
  *   $dir/fp      (doc_id, fp)   — RAW per-doc fingerprint rows, appended
  *   $dir/bands   (h_id, band)   — MinHash band rows, appended
  *   $dir/append_ledger          — (epoch, cid, folded), the replay guard
  *   $dir/_build_id, _writer.lease, index.v<k>/... compacted sets
  * }}}
  *
  * The fp table stores RAW (doc_id, fp) rows, not the aggregated
  * (fp → min doc_id) map: appends stay blind writes, and the read side
  * re-derives the map with the SAME one-definition aggregation batch q112
  * uses ([[DedupOps.historyFpTable]]'s groupBy — [[manifestFp]]). That
  * read-side aggregation is what [[compactManifest]] folds away: a
  * compaction rewrites fp to one min row per fingerprint and bands to
  * distinct rows in a fresh `index.v<k>` set, committed by ONE atomic
  * marker create, with the epoch ledger FOLDED (replay detection exact
  * across the fold) and predecessors retained for in-flight readers —
  * exactly the IVF-PQ rebuild's swap, so the manifest never needs a
  * stop-the-world rewrite either.
  *
  * Crash-window contract (the IndexMaintenance statement, restated): the
  * ledger lands LAST, so a crash between a table append and its ledger
  * row re-applies the epoch on replay and duplicates STORAGE rows only.
  * Every reader is duplicate-tolerant by construction — [[manifestFp]]'s
  * min-aggregation collapses duplicate fp rows, and the candidate stage
  * downstream of the band join is DISTINCT (`deltaDedupCore`) — so a
  * replay can never change a delta verdict; the next compaction removes
  * the duplicate rows from disk.
  *
  * SINGLE-WRITER enforced by the shared lease (one atomic create, named
  * error, explicit release as crash recovery).
  */
object DedupManifest {

  private val FlatTables = Seq("fp", "bands", "append_ledger")
  private val What = "dedup-manifest"

  /** Initialize the manifest from a standing history corpus — the one
    * full-corpus pass the incremental design ever pays.
    */
  def initManifest(hist: DataFrame, dir: String): Unit = {
    val s = hist.sparkSession
    hist.select(col("doc_id"),
        graft.operators.TextOps.fingerprintCol(col("text")).as("fp"))
      .write.mode("overwrite").parquet(s"$dir/fp")
    DedupOps.historyBandTable(hist)
      .write.mode("overwrite").parquet(s"$dir/bands")
    IvfPqIndexStore.writeBuildId(s, dir)
  }

  /** Apply ONE epoch's arrivals idempotently: fp rows, band rows, ledger
    * LAST — the shared leased epoch-idempotence device
    * ([[IvfPqIndexStore.applyEpochOnce]], ONE definition with the IVF-PQ
    * maintenance sink). Returns false on replay or an empty batch.
    */
  private[graft] def appendEpoch(batch: DataFrame, epoch: Long,
      dir: String, leaseToken: Option[String] = None): Boolean =
    IvfPqIndexStore.applyEpochOnce(batch, epoch, dir, leaseToken,
      What, "doc_id") { (b, rdir) =>
      b.select(col("doc_id"),
          graft.operators.TextOps.fingerprintCol(col("text")).as("fp"))
        .write.mode("append").parquet(s"$rdir/fp")
      DedupOps.historyBandTable(b)
        .write.mode("append").parquet(s"$rdir/bands")
    }

  /** The maintenance sink: attach to a stream of documents (doc_id, text)
    * ADMITTED into history — typically the keepers a curation waterfall
    * emits — and the manifest tracks them per trigger. Claims the
    * single-writer lease at attach (named error on a second maintainer).
    */
  def manifestAppendSink(docs: DataFrame, dir: String,
      autoCompactEpochs: Int = 256): DataStreamWriter[Row] = {
    val s = docs.sparkSession
    val token = java.util.UUID.randomUUID().toString
    IvfPqIndexStore.acquireLease(s, dir, token, What)
    // auto-compaction arming counter (r14 verdict #6): compactManifest
    // existed but nothing called it on a bar — a year-scale stream
    // accumulates one file per epoch forever. The sink counts epochs IT
    // applied and, at every `autoCompactEpochs`-th, runs the PRECISE
    // ledger check + compaction under its own lease (the swap happens
    // between triggers it owns — no second writer can race it). The
    // counter is driver memory: a restart re-arms after the next
    // `autoCompactEpochs` epochs, and the precise check then sees the
    // true unfolded backlog — deferred, never lost. 0 disables.
    var sinceCompact = 0
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      if (appendEpoch(batch, epoch, dir, Some(token))) {
        sinceCompact += 1
        if (autoCompactEpochs > 0 && sinceCompact >= autoCompactEpochs) {
          compactIfOversized(s, dir, autoCompactEpochs,
            ownerToken = Some(token)): Unit
          sinceCompact = 0
        }
      }
    }
  }

  /** The compaction TRIGGER (r14 verdict #6): compact when the resolved
    * set's unfolded-epoch backlog reaches `maxUnfoldedEpochs` — the
    * rebuildIfStale shape (cheap check every call, the linear rewrite
    * only past the bar). Converges: a compaction folds every epoch, so
    * the next call reads zero unfolded and no-ops (spec-pinned, with
    * verdict identity across the fold). Returns whether a compaction ran.
    * `ownerToken`: a maintainer that already holds the writer lease (the
    * sink's auto-compaction) passes its token; standalone callers
    * (IndexAdmin's `compact-manifest --if-oversized`, a cron) leave it
    * None and the compaction claims the lease itself.
    */
  def compactIfOversized(s: SparkSession, dir: String,
      maxUnfoldedEpochs: Int = 256, keep: Int = 1,
      ownerToken: Option[String] = None): Boolean = {
    val rdir = IvfPqIndexStore.resolveRead(s, dir)
    val backlog = IvfPqIndexStore.readLedger(s, rdir) match {
      case None => 0L
      case Some(led) =>
        led.filter(!col("folded")).select("epoch").distinct().count()
    }
    if (backlog >= math.max(maxUnfoldedEpochs, 1)) {
      compactManifest(s, dir, keep, ownerToken); true
    } else false
  }

  /** Release the manifest directory's single-writer lease. */
  def releaseManifestLease(s: SparkSession, dir: String): Unit =
    IvfPqIndexStore.releaseLease(s, dir)

  /** The history fingerprint map exactly as [[DedupOps.deltaDedupCore]]
    * consumes it — the same aggregation [[DedupOps.historyFpTable]]
    * computes from text, read off the manifest instead (duplicate rows
    * from a crash-window replay collapse under the min).
    */
  def manifestFp(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${IvfPqIndexStore.resolveRead(s, dir)}/fp")
      .groupBy("fp").agg(min("doc_id").as("hist_id"))

  /** The history band table as [[DedupOps.deltaDedupCore]] consumes it. */
  def manifestBands(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${IvfPqIndexStore.resolveRead(s, dir)}/bands")

  /** q143's operator body: q112's delta verdicts SERVED BY THE MANIFEST —
    * the arriving batch drives all pair work exactly as before, but the
    * history side is two parquet reads instead of a full-corpus
    * re-fingerprint + re-minhash. `verifyDocs` remains a corpus handle:
    * the exact-Jaccard verify stage re-shingles only the candidate-id
    * sliver (the q40 discipline), a doc_id-keyed point read no
    * fingerprint manifest can or should replace.
    */
  def deltaDedupAgainstManifest(arrivals: DataFrame, dir: String,
      verifyDocs: DataFrame,
      maxBroadcastIds: Long = DedupOps.deltaBroadcastMaxIds): DataFrame = {
    val s = arrivals.sparkSession
    DedupOps.deltaDedupCore(arrivals, manifestFp(s, dir),
      manifestBands(s, dir), verifyDocs, maxBroadcastIds)
  }

  /** COMPACTION: rewrite the manifest into a fresh versioned set — fp
    * folded to one min row per fingerprint, bands distinct, ledger folded
    * to one row per applied epoch — committed by ONE atomic marker
    * create; readers mid-compaction keep their resolved set (retention
    * keeps one predecessor). This is the IVF-PQ rebuild's swap applied to
    * the manifest: it bounds both the duplicate rows a crash-window
    * replay can leave and the one-file-per-epoch accumulation of a
    * year-scale stream.
    */
  def compactManifest(s: SparkSession, dir: String, keep: Int = 1,
      ownerToken: Option[String] = None): Unit = {
    // the compaction runs under the SAME single-writer lease the sink
    // holds (the rebuildIvfPqIndexFrom rationale verbatim): an append
    // racing the compaction's table reads would land rows in the old set
    // AFTER they were folded — silently lost from the new one. One atomic
    // lease create serializes all writers; a standalone compaction claims
    // it (stop the maintainer and release its lease first), while a
    // maintainer compacting its own store passes `ownerToken` — verified,
    // not re-acquired, and NOT released on exit (the sink still owns it).
    ownerToken match {
      case Some(t) => IvfPqIndexStore.requireLease(s, dir, t, What)
      case None => IvfPqIndexStore.acquireLease(s, dir,
        s"compact-${java.util.UUID.randomUUID()}", What)
    }
    try {
      val rdir = IvfPqIndexStore.resolveRead(s, dir)
      val vdir = s"$dir/index.v${IvfPqIndexStore.nextVersion(s, dir)}"
      val vpath = new org.apache.hadoop.fs.Path(vdir)
      val fs = vpath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(vpath)) fs.delete(vpath, true) // crashed-attempt leftover
      // NO coalesce(1) on these (r14 review): fp/bands are
      // |history|-sized — funneling the rewrite through one writer task
      // is exactly the stop-the-world rewrite the versioned swap exists
      // to avoid. The groupBy/distinct shuffle partitioning carries
      // through to the write; only the ledger fold (per-epoch tiny rows)
      // coalesces.
      s.read.parquet(s"$rdir/fp")
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id", "fp")
        .write.mode("overwrite").parquet(s"$vdir/fp")
      s.read.parquet(s"$rdir/bands").distinct()
        .write.mode("overwrite").parquet(s"$vdir/bands")
      IvfPqIndexStore.foldLedgerInto(s, rdir, vdir)
      IvfPqIndexStore.writeBuildId(s, vdir)
      IvfPqIndexStore.commit(s, vdir)
      IvfPqIndexStore.pruneVersions(s, dir, keep, FlatTables)
    } finally if (ownerToken.isEmpty) IvfPqIndexStore.releaseLease(s, dir)
  }
}
