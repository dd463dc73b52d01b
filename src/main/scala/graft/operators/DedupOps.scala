package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Deduplication operators over `documents` (SURVEY.md §7.1 M6 / the
  * training-data pipeline pack): exact hash dedup, word-3-gram Jaccard
  * near-dup, and MinHash+LSH banding.
  *
  * Scale design: exact dedup is one hash-shuffle on the fingerprint.
  * N-gram Jaccard is quadratic only WITHIN shingle buckets (the shingle
  * self-join); MinHash/LSH reduces that to band-bucket joins — at 100 TB you
  * run LSH first and feed only candidate pairs to the exact Jaccard
  * verifier, which is precisely how the queries below compose.
  *
  * MinHash here is md5-based (min of md5(seed|shingle) hex strings): fully
  * deterministic, engine-portable (DuckDB computes the identical signature),
  * and requires no UDF — every step is a codegen'd builtin expression.
  */
object DedupOps {

  private val nHashes = 8 // 4 bands × 2 rows

  /** q34 stop-shingle bound: shingles in more than this many documents are
    * dropped before the self-join (they are corpus boilerplate and make the
    * join bucket quadratic). Mirrored verbatim in the DuckDB oracle.
    */
  val maxShingleDf = 100

  /** doc_id, s — word-3-gram shingles per document (with duplicates). */
  private def rawShingles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(t)-2, 1)), i -> concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2)))")).as("s"))

  /** distinct variant for the set-based Jaccard math. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    rawShingles(s, d).distinct()

  private val duckShingles =
    """SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) toks,
            UNNEST(range(1, greatest(len(t)-1, 2))) AS u(i)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by content hash, keep the lowest doc_id.
    "q30_dedup_exact" -> ((s, d) => {
      documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")
    }),

    // N-gram Jaccard near-dup: shingle self-join → pair intersection counts
    // → |A∩B| / (|A|+|B|-|A∩B|) ≥ 0.3.
    //
    // Frequent-shingle guard (standard stop-shingle practice): a shingle
    // present in more than `maxShingleDf` documents is boilerplate and makes
    // its self-join bucket quadratic in corpus size — drop it BEFORE the
    // join, and compute the per-doc counts from the same filtered table so
    // the Jaccard math stays internally consistent (oracle applies the
    // identical document-frequency WHERE). One window pass (single shuffle
    // by s) tags each shingle with its df; WindowExec spills, so even the
    // hot partition is disk-bound, not memory-bound.
    "q34_ngram_jaccard" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // three consumers (counts + both self-join sides): persist so the
      // shingle generation runs once; MEMORY_AND_DISK spills, never OOMs
      val sh = shingles(s, d)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
        .filter(col("df") <= maxShingleDf)
        .drop("df")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(counts.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(counts.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jacc") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("jacc"), 4).as("jacc"))
        .orderBy("id_a", "id_b")
    }),

    // MinHash + LSH: 8 minhash lanes → 4 bands of 2 → candidate pairs that
    // collide on any band. The 8 lanes are 8-hex-char slices of TWO md5s
    // per shingle (not 8 separate md5s) — 4× less hashing on the hot path,
    // identical minwise semantics: each lane is an independent uniform
    // hash of the shingle.
    "q35_minhash_lsh" -> ((s, d) => {
      // no .distinct() before the signature: min() is duplicate-insensitive,
      // so skipping the dedup shuffle changes nothing (oracle keeps DISTINCT)
      lshCandidates(rawShingles(s, d)).orderBy("id_a", "id_b")
    }),

    // SimHash (16-bit, md5-nibble-derived) per document + near-dup pairs at
    // hamming distance ≤ 2. bit_count is a builtin in both engines.
    //
    // Scale design (value-space neighbor enumeration, not doc-space pairs):
    // a 16-bit hash has at most 65,536 DISTINCT values no matter the corpus
    // size, so documents collapse into per-value groups first. Every value
    // has exactly 136 Hamming neighbors at distance 1-2 — enumerate them
    // (V×136 rows, linear) and equi-join against the existing values; no
    // pair join ever happens in doc space and nothing is quadratic
    // (cf. Manku et al., WWW'07 simhash dedup). Doc pairs are expanded only
    // for value pairs that matched, which is output-bound work.
    "q36_simhash" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("h16", expr(
          """(instr('0123456789abcdef', substr(md5(w),1,1))-1)*4096 +
             (instr('0123456789abcdef', substr(md5(w),2,1))-1)*256 +
             (instr('0123456789abcdef', substr(md5(w),3,1))-1)*16 +
             (instr('0123456789abcdef', substr(md5(w),4,1))-1)"""))
      val voteAggs = (0 until 16).map(b =>
        sum(expr(s"CASE WHEN (h16 DIV ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END")).as(s"v$b"))
      val votes = tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      val sim = votes.select(col("doc_id") +:
        Seq(expr((0 until 16).map(b => s"(CASE WHEN v$b > 0 THEN ${1 << b} ELSE 0 END)")
          .mkString(" + ")).cast("long").as("simhash")): _*)
      simhashPairs(sim).orderBy("id_a", "id_b")
    }),

    // LSH → exact-verify composition (the 100 TB near-dup pipeline): MinHash
    // band candidates (q35's plan) verified with exact n-gram Jaccard
    // (q34's math) — quadratic work only inside LSH buckets, never across
    // the corpus. Fills the q40 numbering gap.
    "q40_lsh_jaccard_verified" -> ((s, d) => {
      // the corpus-sized shingle table is deliberately NOT persisted: the
      // signature stage streams it once, and caching it to serve the tiny
      // verify slice costs more than the recompute (measured 3.1s → 9.4s at
      // sf0.1). What IS persisted is everything candidate-bounded (r3
      // verdict #1): `cand` feeds two consumers (the id set and the
      // intersect join) — uncached, the whole 2-md5-per-shingle signature
      // chain runs twice; `shc` feeds three (counts + both join sides) —
      // uncached, tokenize+shingle+explode runs three more times.
      val cand = lshCandidates(rawShingles(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // only candidate docs matter for the verify stage: semi-filter the RAW
      // shingle table on the (small) candidate id set BEFORE the distinct,
      // so the dedup shuffle — and every downstream join and count — is
      // candidate-sized, not corpus-sized (filter-then-distinct ≡
      // distinct-then-filter on a per-doc predicate)
      val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
      val shc = rawShingles(s, d).join(broadcast(ids), "doc_id").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(shc.select(col("doc_id").as("id_a"), col("s")), "id_a")
        .join(shc.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("inter"))
      inter
        .join(counts.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(counts.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jacc") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("jacc"), 4).as("jacc"))
        .orderBy("id_a", "id_b")
    })
  )

  /** SimHash near-dup pairs (Hamming distance ≤ 2) from a `(doc_id,
    * simhash)` table — the distribution core of q36, factored so specs can
    * drive it with synthetic value distributions.
    *
    * Everything stays row-shaped: no `collect_list` id arrays anywhere, so a
    * degenerate corpus (millions of docs sharing one simhash value) is a
    * shuffle-join with a hot key — streamed by the join, spilled by the
    * sorter — instead of one unbounded array in a single task row (r3
    * verdict "what's wrong" #3).
    *
    *  - value space first: ≤ 65,536 distinct 16-bit values at any corpus
    *    size; every value has exactly 136 Hamming-1/2 neighbors, enumerated
    *    as (V × 136) rows and equi-joined against existing values.
    *  - doc pairs are expanded only for matched value pairs, by joining the
    *    `(simhash, doc_id)` table once per side — output-bound work.
    *  - `sim` is persisted (4 consumers: distinct values, both cross sides,
    *    both same-value sides); it is (doc_id, simhash) — 16 bytes/row —
    *    and MEMORY_AND_DISK spills.
    */
  def simhashPairs(sim0: DataFrame): DataFrame = {
    val sim = sim0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vals = sim.select("simhash").distinct() // ≤ 65,536 rows
    // the distance-1/2 Hamming ball: 16 single-bit + 120 two-bit masks
    val masks = (0 until 16).map(1 << _) ++
      (for (i <- 0 until 16; j <- (i + 1) until 16) yield (1 << i) | (1 << j))
    val valPairs = vals.select(col("simhash").as("sa"),
        explode(expr(s"array(${masks.mkString(",")})")).as("mask"))
      .withColumn("sb", expr("CAST(sa AS INT) ^ mask").cast("long"))
      .filter(col("sb") > col("sa")) // each unordered value pair once
      .join(vals.select(col("simhash").as("sb")), "sb") // existing values only
      .withColumn("dist", expr("bit_count(mask)").cast("long"))
      .select("sa", "sb", "dist")
    // doc expansion: join the pair table per side — never an id array
    val cross = valPairs
      .join(sim.select(col("simhash").as("sa"), col("doc_id").as("ia")), "sa")
      .join(sim.select(col("simhash").as("sb"), col("doc_id").as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
    // same-value pairs (distance 0): self-join within each value
    val same = sim.as("a")
      .join(sim.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        lit(0L).as("dist"))
    cross.unionByName(same).select(col("id_a"), col("id_b"), col("dist"))
  }

  /** MinHash signature → 4 band keys → colliding (id_a, id_b) candidate
    * pairs. Works on raw or distinct shingles identically (min() is
    * duplicate-insensitive). Shared by q35 and q40's composition.
    */
  private def lshCandidates(sh0: DataFrame): DataFrame = {
    val sh = sh0
      .withColumn("ma", md5(concat(lit("a|"), col("s"))))
      .withColumn("mb", md5(concat(lit("b|"), col("s"))))
    val sigAggs = (0 until nHashes).map { i =>
      val src = if (i < 4) "ma" else "mb"
      min(substring(col(src), 1 + 8 * (i % 4), 8)).as(s"h$i")
    }
    val sig = sh.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val banded = sig.select(
      col("doc_id"),
      md5(concat(col("h0"), col("h1"))).as("b0"),
      md5(concat(col("h2"), col("h3"))).as("b1"),
      md5(concat(col("h4"), col("h5"))).as("b2"),
      md5(concat(col("h6"), col("h7"))).as("b3"))
    val buckets = (0 until 4).map(i =>
      banded.select(col("doc_id"), lit(i).as("bi"), col(s"b$i").as("bk")))
      .reduce(_.unionByName(_))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  private val minhashAggs =
    (0 until nHashes).map { i =>
      val src = if (i < 4) "ma" else "mb"
      s"min(substr($src, ${1 + 8 * (i % 4)}, 8)) AS h$i"
    }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY h ORDER BY h""",

    "q34_ngram_jaccard" ->
      s"""WITH sh0 AS ($duckShingles),
         sh AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh0)
           WHERE df <= $maxShingleDf),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id_a, id_b, round(inter/(ca.n + cb.n - inter), 4) AS jacc
         FROM inter
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE inter/(ca.n + cb.n - inter) >= 0.3
         ORDER BY id_a, id_b""",

    "q35_minhash_lsh" ->
      s"""WITH sh0 AS ($duckShingles),
         sh AS (SELECT doc_id, md5('a|' || s) AS ma, md5('b|' || s) AS mb FROM sh0),
         sig AS (SELECT doc_id, $minhashAggs FROM sh GROUP BY doc_id),
         banded AS (SELECT doc_id, md5(h0||h1) AS b0, md5(h2||h3) AS b1,
                           md5(h4||h5) AS b2, md5(h6||h7) AS b3 FROM sig),
         buckets AS (
           SELECT doc_id, 0 AS bi, b0 AS bk FROM banded
           UNION ALL SELECT doc_id, 1, b1 FROM banded
           UNION ALL SELECT doc_id, 2, b2 FROM banded
           UNION ALL SELECT doc_id, 3, b3 FROM banded)
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM buckets a JOIN buckets b
           ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",

    "q40_lsh_jaccard_verified" ->
      s"""WITH sh AS ($duckShingles),
         shm AS (SELECT doc_id, md5('a|' || s) AS ma, md5('b|' || s) AS mb FROM sh),
         sig AS (SELECT doc_id, $minhashAggs FROM shm GROUP BY doc_id),
         banded AS (SELECT doc_id, md5(h0||h1) AS b0, md5(h2||h3) AS b1,
                           md5(h4||h5) AS b2, md5(h6||h7) AS b3 FROM sig),
         buckets AS (
           SELECT doc_id, 0 AS bi, b0 AS bk FROM banded
           UNION ALL SELECT doc_id, 1, b1 FROM banded
           UNION ALL SELECT doc_id, 2, b2 FROM banded
           UNION ALL SELECT doc_id, 3, b3 FROM banded),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT c.id_a, c.id_b, count(*) AS inter
           FROM cand c
           JOIN sh a ON a.doc_id = c.id_a
           JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
           GROUP BY c.id_a, c.id_b)
         SELECT id_a, id_b, round(inter/(ca.n + cb.n - inter), 4) AS jacc
         FROM inter
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE inter/(ca.n + cb.n - inter) >= 0.3
         ORDER BY id_a, id_b""",

    "q36_simhash" ->
      s"""WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         hashed AS (
           SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(w),1,1))-1)*4096 +
             (strpos('0123456789abcdef', substr(md5(w),2,1))-1)*256 +
             (strpos('0123456789abcdef', substr(md5(w),3,1))-1)*16 +
             (strpos('0123456789abcdef', substr(md5(w),4,1))-1) AS h16
           FROM tok),
         votes AS (
           SELECT doc_id,
             ${(0 until 16).map(b => s"sum(CASE WHEN (h16 // ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(", ")}
           FROM hashed GROUP BY doc_id),
         sim AS (
           SELECT doc_id,
             CAST(${(0 until 16).map(b => s"(CASE WHEN v$b > 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
           FROM votes)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(CAST(a.simhash AS INTEGER), CAST(b.simhash AS INTEGER))) AS BIGINT) AS dist
         FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(CAST(a.simhash AS INTEGER), CAST(b.simhash AS INTEGER))) <= 2
         ORDER BY id_a, id_b"""
  )
}
