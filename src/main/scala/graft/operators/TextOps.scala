package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token statistics, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (whole-stage codegen, no
  * UDFs) — at 100 TB these run as a single narrow map stage over the scan,
  * no shuffle except the final aggregations.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private val stopList  = stopwords.map(w => s"'$w'").mkString(", ")

  /** q33's canonical-form fingerprint (lowercase, strip non-alphanumerics,
    * md5) as a reusable column — the streaming intake (DocStreams) applies
    * the SAME expression so batch and streaming dedup keys are
    * bit-identical by construction, not by parallel maintenance.
    */
  def fingerprintCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(text), "[^a-z0-9 ]", ""))

  /** q68 scrub patterns: Java-regex and RE2 compatible (both engines),
    * anchored to the simple token shapes that survive whitespace
    * tokenization. Emails first so the URL pattern cannot eat an
    * address's domain half.
    */
  private[operators] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val urlRe = "https?://[^ ]+"

  /** q68's operator body, reusable over any (doc_id, text) frame: redact
    * emails then URLs, count each redaction kind. Counts are the MARKERS
    * surviving in `clean_text`, so they reconcile against the output by
    * construction — an email-shaped substring inside a URL
    * (`…?u=bob@x.com`) is first rewritten to `<EMAIL>` and then swallowed
    * whole by the URL pass, and counting the input would report an email
    * marker the output doesn't have. The flip side of counting the OUTPUT:
    * a document whose original text already contains a literal `<EMAIL>`
    * or `<URL>` token is counted as if it were a redaction — the counts
    * are "markers present after scrubbing", an upper bound on redactions
    * performed, not an exact tally (consumers needing exact tallies should
    * normalize pre-existing markers away first). Pure row-local column
    * expressions — zero shuffle at any corpus size. The sf fixtures
    * contain neither
    * pattern (the oracle pins the identity pass); TextOpsScrubSpec drives
    * planted addresses/URLs, including the email-inside-URL case, through
    * the same body.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(col("text"), emailRe, "<EMAIL>"), urlRe, "<URL>")
    docs.select(
      col("doc_id"),
      clean.as("clean_text"),
      regexp_count(clean, lit("<EMAIL>")).cast("long").as("n_emails"),
      regexp_count(clean, lit("<URL>")).cast("long").as("n_urls"))
  }

  /** q38's quality score as a reusable column (same sharing rationale). */
  def qualityScoreCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nTokens = size(split(text, " "))
    val avgWlen = (length(text) - nTokens + 1) / nTokens
    least(lit(1.0), nTokens / 200.0) *
      when(avgWlen.between(2.5, 8.0), 1.0).otherwise(0.5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + distinct-token stats per document.
    "q31_text_stats" -> ((s, d) => {
      documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"))
    }),

    // Language-ID heuristic: stopword-hit ratio (deterministic n-gram-free
    // variant; the testdata text is synthetic so the score IS the output).
    "q32_lang_score" -> ((s, d) => {
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_stop", expr(s"size(filter(toks, x -> x IN ($stopList)))"))
        .select(
          col("doc_id"), col("lang"),
          round(col("n_stop") / size(col("toks")), 4).as("stop_ratio"),
          when(col("n_stop") / size(col("toks")) > 0.04, "en").otherwise("other").as("guess"))
    }),

    // Document fingerprint: md5 over a normalized form (lowercase, strip
    // non-alphanumerics) — the canonical-form dedup key.
    "q33_fingerprint" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), fingerprintCol(col("text")).as("fp"))
    }),

    // TF-IDF: term frequency per (doc, token) × smoothed inverse document
    // frequency, top 20 scored terms corpus-wide. Scale shape: tf is a
    // combiner-friendly groupBy (duplicate tokens collapse map-side —
    // unlike q34's per-doc-distinct shingles, token repetition is real
    // here), df is a groupBy over the per-doc-distinct token table, the
    // corpus size joins in as a broadcast scalar, and top-k is
    // TakeOrdered (per-partition heaps, no global sort).
    "q48_tfidf" -> ((s, d) => {
      val docs = documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      // tf is already one row per (doc, w), so document frequency is a
      // row-count per w OVER TF — the corpus-sized token explode runs once
      // (a separate distinct+groupBy branch would re-scan the corpus)
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      tf.join(dfreq, "w")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("w"), col("tf"),
          round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 4)
            .as("score"))
        .orderBy(desc("score"), col("doc_id"), col("w"))
        .limit(20)
    }),

    // Vocabulary coverage curve: the top-100 corpus tokens by frequency
    // with cumulative coverage share — the "what vocab size covers X% of
    // the token stream" analysis run before fixing a tokenizer vocab.
    // Scale shape: one combiner-friendly groupBy over the exploded token
    // stream (token frequencies are zipfian but a LONG count never skews a
    // partial agg), corpus token total folded from the SAME frequency
    // table (no second corpus scan), TakeOrdered for the top-k; the
    // running-sum window runs AFTER the limit, over 100 rows on one
    // partition — vocab-sized, not corpus-sized.
    "q59_vocab_coverage" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val freq = documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val total = freq.agg(sum("freq").as("total"))
      val w = Window.orderBy(desc("freq"), col("w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      freq.orderBy(desc("freq"), col("w")).limit(100)
        .crossJoin(broadcast(total))
        .select(
          row_number().over(Window.orderBy(desc("freq"), col("w")))
            .cast("long").as("rank"),
          col("w"), col("freq"),
          round(sum("freq").over(w) / col("total"), 6).as("cum_share"))
        .orderBy("rank")
    }),

    // Within-document repetition signals (the Gopher-style repetition
    // filters): distinct-token ratio, most-frequent-token share, duplicate
    // bigram fraction. Row-local higher-order functions — zero shuffle at
    // any corpus size. Per-row cost is O(n_tokens × n_distinct) for the
    // top-token count, which assumes length-bounded documents (the normal
    // case after a length gate); for unbounded documents the explode →
    // groupBy(doc_id, w) formulation trades that for one shuffle.
    "q60_repetition_stats" -> ((s, d) => {
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("bigrams", expr(
          """CASE WHEN size(toks) >= 2
               THEN transform(sequence(0, size(toks) - 2),
                              i -> concat(toks[i], ' ', toks[i + 1]))
               ELSE array() END"""))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(size(array_distinct(col("toks"))) / size(col("toks")).cast("double"), 6)
            .as("distinct_ratio"),
          round(expr(
            "array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))")
            / size(col("toks")).cast("double"), 6).as("top_share"),
          when(size(col("bigrams")) === 0, lit(0.0))
            .otherwise(round(lit(1.0) -
              size(array_distinct(col("bigrams"))) / size(col("bigrams")).cast("double"), 6))
            .as("dup_bigram_ratio"))
    }),

    // Sliding-window document chunking — the context-window prep step for
    // embedding / RAG / fixed-window training: each document explodes into
    // overlapping token windows (size 128, stride 64; the tail window may
    // be short). Row-local: start offsets are pure arithmetic
    // (sequence(0, n-1, stride)), chunk ids are start/stride (no ordinal
    // bookkeeping to shuffle), the explode inflates output linearly and
    // the plan stays a narrow map — zero shuffle at any corpus size.
    "q64_chunk_windows" -> ((s, d) => {
      val cs = 128
      val stride = 64
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")))
        .withColumn("start", explode(expr(s"sequence(0, n - 1, $stride)")))
        .select(
          col("doc_id"),
          (col("start") / stride).cast("long").as("chunk_id"),
          col("start").cast("long").as("start_tok"),
          least(lit(cs), col("n") - col("start")).cast("long").as("n_chunk_toks"),
          expr(s"array_join(slice(toks, start + 1, $cs), ' ')").as("chunk_text"))
    }),

    // PII / URL scrubbing: redact emails and URLs, count redactions —
    // the C4-style decontamination pass. Row-local regex projections
    // (Java-regex/RE2-compatible patterns), zero shuffle at any scale.
    // The sf fixtures contain neither pattern, so the oracle pins the
    // identity pass; TextOpsScrubSpec plants real addresses/URLs through
    // the same piiScrub body.
    "q68_pii_scrub" -> ((s, d) => piiScrub(documents(s, d))),

    // Unigram-surprisal quality score (the CCNet-style LM filter, with
    // the corpus's own unigram model standing in for the external LM):
    // score_d = -mean_t log2 p(t), p from corpus token frequencies —
    // low surprisal ≈ repetitive/common text, high ≈ rare-token soup.
    // Scale shape: q48's device — the corpus explodes ONCE into the tf
    // table (combiner-friendly groupBy), corpus frequency and total both
    // derive from tf (vocab-sized scans, not corpus re-scans), and the
    // per-doc mean is the tf-weighted sum over the (doc, w) rows. No
    // broadcast HINT on the log-prob table: a real vocab is unbounded
    // (ids, typos, urls grow it with the corpus), so the join strategy is
    // left to the planner — it broadcasts below the threshold and
    // shuffle-joins above it, instead of force-collecting an unbounded
    // table to the driver. Per-token surprisal is rounded before the mean
    // so cross-engine summation order cannot flip the rounded output.
    "q69_unigram_surprisal" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val freq = tf.groupBy("w").agg(sum("tf").as("freq"))
      val total = freq.agg(sum("freq").as("total"))
      val logp = freq.crossJoin(broadcast(total))
        .select(col("w"),
          round(-log(2.0, col("freq") / col("total")), 6).as("surprisal"))
      tf.join(logp, "w")
        .groupBy("doc_id")
        .agg(round(sum(col("tf") * col("surprisal")) / sum("tf"), 4).as("avg_surprisal"),
          sum("tf").as("n_tokens"))
    }),

    // Quality scoring: length/token heuristics → bucketed score.
    "q38_quality_score" -> ((s, d) => {
      documents(s, d)
        .withColumn("score", qualityScoreCol(col("text")))
        .select(
          col("doc_id"),
          round(col("score"), 4).as("score"),
          when(col("score") >= 0.75, "high")
            .when(col("score") >= 0.35, "mid")
            .otherwise("low").as("bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q31_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
         FROM documents""",

    "q32_lang_score" ->
      s"""SELECT doc_id, lang,
         round(CAST(len(list_filter(string_split(text,' '), x -> x IN ($stopList))) AS BIGINT)
               / CAST(len(string_split(text,' ')) AS BIGINT), 4) AS stop_ratio,
         CASE WHEN CAST(len(list_filter(string_split(text,' '), x -> x IN ($stopList))) AS BIGINT)
                   / CAST(len(string_split(text,' ')) AS BIGINT) > 0.04
              THEN 'en' ELSE 'other' END AS guess
         FROM documents""",

    "q33_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
         FROM documents""",

    "q48_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         dfreq AS (SELECT w, count(*) AS df
                   FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w),
         n AS (SELECT count(*) AS n FROM documents)
         SELECT tf.doc_id, tf.w, tf.tf,
                round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS score
         FROM tf JOIN dfreq ON tf.w = dfreq.w CROSS JOIN n
         ORDER BY score DESC, tf.doc_id, tf.w
         LIMIT 20""",

    "q59_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         freq AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
         total AS (SELECT sum(freq) AS total FROM freq),
         top AS (SELECT w, freq FROM freq ORDER BY freq DESC, w LIMIT 100)
         SELECT CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rank,
                w, freq,
                round(CAST(sum(freq) OVER (ORDER BY freq DESC, w
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / (SELECT total FROM total), 6) AS cum_share
         FROM top ORDER BY rank""",

    "q60_repetition_stats" ->
      """SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6)
             AS distinct_ratio,
           round(list_max(list_transform(list_distinct(toks),
                   t -> len(list_filter(toks, x -> x = t))))
                 / CAST(len(toks) AS DOUBLE), 6) AS top_share,
           CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(bigrams))
                           / CAST(len(bigrams) AS DOUBLE), 6) END
             AS dup_bigram_ratio
         FROM (
           SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents) a) b
         """,

    "q64_chunk_windows" ->
      """SELECT doc_id,
           CAST(start // 64 AS BIGINT) AS chunk_id,
           CAST(start AS BIGINT) AS start_tok,
           CAST(least(128, n - start) AS BIGINT) AS n_chunk_toks,
           array_to_string(list_slice(toks, start + 1, start + 128), ' ') AS chunk_text
         FROM (
           SELECT doc_id, toks, len(toks) AS n,
                  unnest(range(0, len(toks), 64)) AS start
           FROM (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents) a) b""",

    "q68_pii_scrub" ->
      s"""SELECT doc_id, clean_text,
           CAST(len(regexp_extract_all(clean_text, '<EMAIL>')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(clean_text, '<URL>')) AS BIGINT) AS n_urls
         FROM (
           SELECT doc_id,
             regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
                            '$urlRe', '<URL>', 'g') AS clean_text
           FROM documents) t""",

    "q69_unigram_surprisal" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         freq AS (SELECT w, sum(tf) AS freq FROM tf GROUP BY w),
         total AS (SELECT sum(freq) AS total FROM freq),
         logp AS (
           SELECT w, round(-(ln(CAST(freq AS DOUBLE) / total) / ln(2.0)), 6) AS surprisal
           FROM freq, total)
         SELECT t.doc_id,
                round(sum(t.tf * l.surprisal) / sum(t.tf), 4) AS avg_surprisal,
                CAST(sum(t.tf) AS BIGINT) AS n_tokens
         FROM tf t JOIN logp l USING (w)
         GROUP BY t.doc_id""",

    "q38_quality_score" ->
      """SELECT doc_id, round(score, 4) AS score,
         CASE WHEN score >= 0.75 THEN 'high' WHEN score >= 0.35 THEN 'mid' ELSE 'low' END AS bucket
         FROM (
           SELECT doc_id,
             least(1.0, n_tokens/200.0) * (CASE WHEN avg_wlen BETWEEN 2.5 AND 8.0 THEN 1.0 ELSE 0.5 END) AS score
           FROM (
             SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
                    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
                    (CAST(length(text) AS BIGINT) - CAST(len(string_split(text,' ')) AS BIGINT) + 1)
                      / CAST(len(string_split(text,' ')) AS BIGINT) AS avg_wlen
             FROM documents) a) b
         """
  )
}
