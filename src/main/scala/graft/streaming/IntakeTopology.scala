package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.IvfPqIndexStore

/** THE INTAKE TOPOLOGY (r15, the r14 verdict's #7): the library's
  * streaming pieces — admission gates, waterfall accounting, the curation
  * store, the dedup manifest, the IVF-PQ index maintenance, the intake
  * supervisor — shipped as separate attachments; a deployment had to
  * discover the wiring, the lease rules, and the checkpoint layout from
  * seven scaladocs. This builder is that wiring, one call per modality.
  *
  * == Layout (everything under one `root`) ==
  *
  * {{{
  *   $root/curation        — CurationStore: text_log (+ media on batch
  *                           rematerialize), versioned swap sets
  *   $root/manifest        — DedupManifest: fp, bands, versioned sets
  *   $root/index           — IVF-PQ index (built by q122's saveIvfPqIndex
  *                           before the vector wing attaches)
  *   $root/checkpoint_text — the text query's streaming checkpoint
  *   $root/checkpoint_vec  — the vector query's streaming checkpoint
  * }}}
  *
  * == Text wing ([[textIntake]]) ==
  *
  * One foreachBatch per trigger, in this order (the crash-window
  * ordering every piece documents, composed):
  *
  *   1. q113's stage labeling over the arrival batch (gates → dedup →
  *      decontam → quality), history dedup against the driver Bloom;
  *   2. per-stage drop counts to `onCounts` (at-least-once — consumers
  *      dedup on the epoch id);
  *   3. the staged rows (doc_id, fp, stage, keeper) append to the
  *      CURATION STORE (leased, replay-proof, ledger LAST) — q128/q134
  *      and the dashboards read this;
  *   4. the trigger's KEPT documents append to the DEDUP MANIFEST
  *      (leased, replay-proof), with the auto-compaction bar armed —
  *      q143 delta-dedups the next dump against this;
  *   5. only then do the new keepers' fingerprints claim the Bloom — so
  *      a crash ANYWHERE above replays the epoch against the unchanged
  *      filter and recomputes byte-identical rows (duplicate storage at
  *      worst, which the stores detect and their readers collapse).
  *      Across a RESTART the same holds because the attach reseeds the
  *      filter from the keepers of epochs committed in BOTH stores
  *      ([[CurationStore.committedKeeperFingerprints]]) — the uncommitted
  *      epoch's rows are excluded, so its replay sees the filter state
  *      its crashed attempt saw.
  *
  * == Vector wing ([[vectorIntake]]) ==
  *
  * vector-health gate (corrupt embeddings never become index state) →
  * swap-aware ANN admission gate (index-served near-dup drop at the
  * arrival bar) → leased IVF-PQ append with the epoch ledger. Rebuilds
  * ([[graft.operators.SimilarityOps.rebuildIfStale]]) and curation-store
  * rematerialization run as scheduled BATCH jobs, not in the stream —
  * stop the wing (or let the swap-aware resolution pick up the new set
  * at the next trigger; appends resolve per trigger, so a mid-stream
  * rebuild serves the next batch).
  *
  * == Leases ==
  *
  * Each store has its own single-writer lease, claimed when the wing
  * ATTACHES (a second topology on the same root fails by name at attach,
  * not mid-stream). Stop the queries, then [[releaseAll]] — or after a
  * crash, releaseAll is the documented recovery before re-attaching.
  *
  * == Composing the intake supervisor ==
  *
  * A readstat-file intake (PERMISSIVE quarantine + schema-drift
  * restarts) wraps a wing in [[IntakeSupervisor.supervise]]'s builder
  * closure; because the supervisor restarts by STOPPING the query and
  * re-running the builder, the closure must `releaseAll(s, root)` before
  * re-attaching (the previous attach's leases outlive its queries by
  * design — that is what makes a rogue second maintainer fail by name).
  */
object IntakeTopology {

  def curationDir(root: String): String = s"$root/curation"
  def manifestDir(root: String): String = s"$root/manifest"
  def indexDir(root: String): String = s"$root/index"

  /** Attach the TEXT wing to a stream of documents (doc_id, text, ...).
    * Returns a started-ready writer (checkpoint pre-wired under `root`);
    * call `.start()`. `onCounts` receives each trigger's per-stage drop
    * report with its epoch id.
    */
  def textIntake(docs: DataFrame, evalBloom: Array[Byte], root: String,
      expectedDocs: Long = 1L << 20, fpp: Double = 1e-6,
      qualityBar: Double = 0.25, autoCompactEpochs: Int = 256)(
      onCounts: (DataFrame, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    val s = docs.sparkSession
    val cur = curationDir(root)
    val man = manifestDir(root)
    val st = new DocStreams.WaterfallState(expectedDocs, fpp)
    // both leases claim at attach — a half-attachable topology (curation
    // claimed, manifest already owned) must fail BEFORE any epoch runs,
    // and must not leave the first claim behind
    val curToken = java.util.UUID.randomUUID().toString
    IvfPqIndexStore.acquireLease(s, cur, curToken, CurationStore.What)
    val manToken = java.util.UUID.randomUUID().toString
    try IvfPqIndexStore.acquireLease(s, man, manToken, "dedup-manifest")
    catch {
      case e: IllegalStateException =>
        IvfPqIndexStore.releaseLease(s, cur); throw e
    }
    // restart reseed (r15 ADVICE): the history Bloom starts from the
    // keepers of epochs committed in BOTH stores — an epoch whose
    // curation append landed but whose manifest append did not is
    // excluded, so its replay recomputes byte-identical staged rows
    // (curation skips the re-append via its ledger; the manifest
    // receives the kept rows it missed)
    CurationStore.committedKeeperFingerprints(s, cur,
      alsoCommittedIn = Seq(man)).foreach(st.seedFrom)
    var sinceCompact = 0
    docs.writeStream
      .option("checkpointLocation", s"$root/checkpoint_text")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        DocStreams.accountTrigger(batch, epoch, evalBloom, st, qualityBar,
          Some(cur), Some(curToken), onCounts,
          onStaged = (staged, ep) => {
            val kept = batch.join(
              staged.filter(col("stage") === "kept").select("doc_id"),
              "doc_id").select("doc_id", "text")
            if (DedupManifest.appendEpoch(kept, ep, man, Some(manToken))) {
              sinceCompact += 1
              if (autoCompactEpochs > 0 && sinceCompact >= autoCompactEpochs) {
                DedupManifest.compactIfOversized(s, man, autoCompactEpochs,
                  ownerToken = Some(manToken)): Unit
                sinceCompact = 0
              }
            }
          })
      }
  }

  /** Attach the VECTOR wing to a stream of embedding rows (vec_id, e):
    * health gate → ANN admission at `bar` → leased index append with the
    * epoch ledger. The index at [[indexDir]] must exist (q122's build is
    * the one batch prerequisite). `onAdmitted` fires per APPLIED epoch
    * with the admitted rows (skipped on replay — unlike the raw
    * admission sink's at-least-once callback).
    */
  def vectorIntake(vecs: DataFrame, root: String, bar: Double,
      dim: Int = 64, nProbes: Int = 2,
      loNorm: Double = 0.5, hiNorm: Double = 2.0)(
      onAdmitted: (DataFrame, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] = {
    val s = vecs.sparkSession
    val dir = indexDir(root)
    val token = java.util.UUID.randomUUID().toString
    IvfPqIndexStore.acquireLease(s, dir, token)
    IndexMaintenance.annAdmissionSink(
        IndexMaintenance.vectorHealthGate(vecs, dim, loNorm, hiNorm),
        dir, bar, nProbes) {
      (admitted, epoch) =>
        if (IndexMaintenance.appendEpoch(admitted, epoch, dir, Some(token)))
          onAdmitted(admitted, epoch)
    }.option("checkpointLocation", s"$root/checkpoint_vec")
  }

  /** Release every store lease under `root` — normal shutdown after the
    * queries stop, and the crash-recovery path.
    */
  def releaseAll(s: SparkSession, root: String): Unit = {
    IvfPqIndexStore.releaseLease(s, curationDir(root))
    IvfPqIndexStore.releaseLease(s, manifestDir(root))
    IvfPqIndexStore.releaseLease(s, indexDir(root))
  }
}
