package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DOCUMENT intake (EXT, sibling of [[EventStreams]]): the three
  * admission stages a continuously-fed training corpus runs on arrival —
  * canonical-fingerprint dedup, quality gating, per-source accounting. All
  * three compose `readStream → transform → writeStream` and reuse the exact
  * column expressions of the batch operators (q33's fingerprint, q38's
  * quality score), so batch and streaming admission decisions are
  * bit-identical.
  *
  * Inputs use the `documents` schema (doc_id, text, lang, source, n_chars)
  * plus an `ingest_ts` TIMESTAMP column stamped by the ingest edge — the
  * watermark on it is what bounds the dedup state: a fingerprint seen
  * longer ago than the watermark delay can be evicted, trading bounded
  * state for possible re-admission of very-late duplicates (the standard
  * streaming-dedup contract; run the batch q30/q33 pass periodically to
  * reconcile).
  */
object DocStreams {

  /** q33's canonical-form fingerprint as a column (lowercase, strip
    * non-alphanumerics, md5) — shared by batch and streaming paths.
    */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(text), "[^a-z0-9 ]", ""))

  /** Streaming exact dedup on the canonical fingerprint, state bounded by
    * the `ingest_ts` watermark.
    */
  def dedupDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicates("fp")

  /** q38's quality score + bucket as an admission filter: only docs scoring
    * at least `minScore` pass. Pure row-local projection — no state.
    */
  def qualityAdmit(docs: DataFrame, minScore: Double = 0.35): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("avg_wlen",
        (length(col("text")) - col("n_tokens") + 1) / col("n_tokens"))
      .withColumn("score",
        least(lit(1.0), col("n_tokens") / 200.0) *
          when(col("avg_wlen").between(2.5, 8.0), 1.0).otherwise(0.5))
      .filter(col("score") >= minScore)
      .drop("n_tokens", "avg_wlen")

  /** Per-source admitted-document counts over tumbling windows of
    * `ingest_ts` — the intake dashboard aggregate. Watermarked, so window
    * state closes and the sink can run in append mode too.
    */
  def admissionCounts(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_admitted"))
      .select(col("window.start").as("hour"), col("source"), col("n_admitted"))

  /** The full intake pipeline: dedup → quality gate. (Counts attach as a
    * separate sink off the same deduped frame.)
    */
  def intake(docs: DataFrame, watermark: String = "1 hour",
      minScore: Double = 0.35): DataFrame =
    qualityAdmit(dedupDocs(docs, watermark), minScore)
}
