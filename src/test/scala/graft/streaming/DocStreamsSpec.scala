package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming document-intake specs (MemoryStream-driven, like
  * EventStreamsSpec): cross-batch fingerprint dedup, quality gating
  * bit-identical to batch q38, and windowed per-source admission counts.
  */
class DocStreamsSpec extends SparkSpec {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long, ingest_ts: Timestamp)

  final case class MediaHash(doc_id: Long, dhash: Long, ingest_ts: Timestamp)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 80 × 4-char tokens: avg_wlen 4 (inside 2.5–8.0), score = 80/200 = 0.4
  private val goodText = Array.fill(80)("data").mkString(" ")
  private val shortText = "too short" // score ~0.01, rejected

  test("streaming intake dedups fingerprints ACROSS micro-batches and gates quality") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.intake(input.toDF()).writeStream
      .format("memory").queryName("intake").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, goodText, "en", "src0", goodText.length, ts("2024-01-01 10:00:00")),
        // same text, different punctuation — same canonical fingerprint
        Doc(2, goodText + "!!!", "en", "src1", goodText.length + 3, ts("2024-01-01 10:01:00")),
        Doc(3, shortText, "en", "src0", shortText.length, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // duplicate arriving in a LATER micro-batch must still be dropped
      // (state carries across batches — that's the point of streaming dedup)
      input.addData(
        Doc(4, goodText, "en", "src2", goodText.length, ts("2024-01-01 10:10:00")),
        Doc(5, goodText + " extra unique tail of words", "en", "src3",
          goodText.length + 27, ts("2024-01-01 10:11:00")))
      q.processAllAvailable()
      val ids = sp.sql("SELECT doc_id FROM intake ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      // doc 2 (same fp as 1), doc 3 (low quality), doc 4 (cross-batch dup) out
      assert(ids === Seq(1L, 5L))
    } finally q.stop()
  }

  test("a rejected low-quality doc does not claim its fingerprint's dedup state") {
    // same canonical fingerprint as goodText (punctuation strips out), but
    // avg word length 11 → 0.5 multiplier → score 0.2, below the gate:
    // the gate must run BEFORE dedup, else this rejected doc consumes the
    // fingerprint and the admissible variant below is dropped as a dup —
    // neither copy admitted
    val lowVariant = Array.fill(80)("data!!!!!!!").mkString(" ")
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.intake(input.toDF()).writeStream
      .format("memory").queryName("intake_order").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, lowVariant, "en", "src0", lowVariant.length, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // the admissible variant arrives in a LATER batch, same fingerprint
      input.addData(
        Doc(2, goodText, "en", "src1", goodText.length, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val ids = sp.sql("SELECT doc_id FROM intake_order ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(2L), "rejected doc 1 must not shadow admissible doc 2")
    } finally q.stop()
  }

  test("streaming quality gate admits exactly the docs batch q38 scores >= 0.35") {
    val sp = spark
    import sp.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = sp.read.parquet(s"$d/documents.parquet")
      .withColumn("ingest_ts", org.apache.spark.sql.functions.lit(ts("2024-01-01 00:00:00")))
    val streamedRule = DocStreams.qualityAdmit(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchRule = graft.operators.TextOps.queries("q38_quality_score")(sp, d)
      .filter("score >= 0.35").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamedRule === batchRule)
    assert(streamedRule.nonEmpty)
  }

  test("streaming Gopher gate admits exactly the docs batch q77 marks keep=1") {
    val sp = spark
    val d = "/root/testdata/sf0.001"
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val streamedRule = DocStreams.gopherAdmit(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchRule = graft.operators.TextOps.queries("q77_gopher_rules")(sp, d)
      .filter("keep = 1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamedRule === batchRule)
    // the gate discriminates on this corpus: some admitted, some rejected
    assert(streamedRule.nonEmpty)
    assert(streamedRule.size < docs.count())
  }

  test("streaming decontamination gate drops gram-sharing docs, passes clean and short docs") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // eval set: two 5-grams (one never-matching decoy keeps the filter honest)
    val evalGrams = Seq("the quick brown fox jumps", "decoy gram never seen here").toDF("g")
    val bloom = evalGrams.stat.bloomFilter("g", 2L, 0.001)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    val input = MemoryStream[Doc]
    val q = DocStreams.decontaminationGate(input.toDF(), bytes).writeStream
      .format("memory").queryName("decontam").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        // contains the eval 5-gram mid-document → dropped
        Doc(1, "a b the quick brown fox jumps over c d", "en", "s", 1,
          ts("2024-01-01 10:00:00")),
        // clean doc, same vocabulary but never the full 5-gram → admitted
        Doc(2, "the quick brown dog jumps over the lazy fox", "en", "s", 1,
          ts("2024-01-01 10:01:00")),
        // sub-5-token doc: no grams, must pass (not crash under ANSI)
        Doc(3, "four tokens only here", "en", "s", 1, ts("2024-01-01 10:02:00")),
        // exact eval text with nothing around it → dropped
        Doc(4, "the quick brown fox jumps", "en", "s", 1, ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val ids = sp.sql("SELECT doc_id FROM decontam ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(2L, 3L))
    } finally q.stop()
  }

  test("streaming near-dup gate drops docs sharing a winnow fingerprint with the corpus") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // historical corpus: one 30-token document
    val corpusText = (0 until 30).map(i => s"hist$i").mkString(" ")
    val corpus = Seq((100L, corpusText)).toDF("doc_id", "text")
    val fps = graft.operators.TextOps.winnowFpValues(corpus)
    val bloom = fps.stat.bloomFilter("fp", 64L, 1e-4)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    val input = MemoryStream[Doc]
    val q = DocStreams.nearDupGate(input.toDF(), bytes).writeStream
      .format("memory").queryName("neardup").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        // re-crawl with a new head and tail but a long shared run (tokens
        // 5..20 of the corpus doc — ≥ 6-token run guarantees a shared
        // fingerprint by the winnowing coverage property) → dropped
        Doc(1, "new head " + (5 until 20).map(i => s"hist$i").mkString(" ")
          + " new tail", "en", "s", 1, ts("2024-01-01 10:00:00")),
        // same vocabulary, never 3 consecutive corpus tokens → admitted
        Doc(2, (0 until 30 by 3).map(i => s"hist$i x$i y$i").mkString(" "),
          "en", "s", 1, ts("2024-01-01 10:01:00")),
        // sub-3-token doc: no fingerprints, must pass (ANSI guard)
        Doc(3, "two tokens", "en", "s", 1, ts("2024-01-01 10:02:00")),
        // unrelated doc → admitted
        Doc(4, (0 until 25).map(i => s"fresh$i").mkString(" "), "en", "s", 1,
          ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val ids = sp.sql("SELECT doc_id FROM neardup ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(2L, 3L, 4L))
    } finally q.stop()
  }

  test("near-dup gate probes the EXACT fingerprint values batch q92 selects") {
    val sp = spark
    import sp.implicits._
    // one-definition contract: a filter built from winnowFpValues must
    // drop the very document it was built from (its own fps all hit)
    val text = (0 until 40).map(i => s"self$i").mkString(" ")
    val self = Seq((1L, text)).toDF("doc_id", "text")
    // the documented build recipe VERBATIM — winnowFpValues' fp is the
    // string rendering, so bloomFilter("fp", …) hashes what the gate probes
    val fps = graft.operators.TextOps.winnowFpValues(self)
    val bloom = fps.stat.bloomFilter("fp", 64L, 1e-4)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    // batch-mode application of the same gate body (gates are plain
    // DataFrame transforms — the streaming wrapper adds nothing)
    val batchDocs = Seq((1L, text), (2L, "wholly unrelated content words"))
      .toDF("doc_id", "text")
    val admitted = DocStreams.nearDupGate(batchDocs, bytes)
      .collect().map(_.getLong(0)).toSeq
    assert(admitted === Seq(2L))
  }

  test("streaming gate agrees with batch q74 flags on the sf corpus (no false negatives)") {
    val sp = spark
    val d = "/root/testdata/sf0.01"
    val docs = graft.util.Tables.documents(sp, d)
    // build the eval filter exactly as batch q74 does (docs < 10 are eval)
    val grams = graft.operators.DedupOps.queries("q67_decontam_flags")(sp, d)
    val flagged = grams.select("doc_id").collect().map(_.getLong(0)).toSet
    val evalDocs = docs.filter("doc_id < 10")
    val evalGramSet = evalDocs
      .selectExpr("split(text, ' ') AS t")
      .filter("size(t) >= 5")
      .selectExpr("explode(array_distinct(transform(sequence(1, size(t) - 4), " +
        "i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), " +
        "element_at(t, i+2), element_at(t, i+3), element_at(t, i+4))))) AS g")
      .distinct()
    val n = evalGramSet.count()
    // per-DOC over-drop ≈ n_grams × fpp (the gate's scaladoc formula):
    // at 1e-6 over ~60-gram docs the expected clean-doc loss is ~0
    val bloom = evalGramSet.stat.bloomFilter("g", n, 1e-6)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    // run the gate in BATCH mode (same column expressions either way) over
    // the corpus side; every q67/q74-flagged doc must be dropped — the
    // no-false-negative half of the contract
    val admitted = DocStreams.decontaminationGate(docs.filter("doc_id >= 10"), bytes)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.intersect(admitted).isEmpty,
      s"contaminated docs admitted: ${flagged.intersect(admitted)}")
    val corpusN = docs.filter("doc_id >= 10").count()
    assert(admitted.size >= corpusN - flagged.size - 2,
      s"gate over-dropped: ${corpusN - flagged.size - admitted.size} clean docs")
  }

  test("minhash-band gate: streaming drop/pass parity with batch q35 on planted near-dups") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // history: one 40-token doc. Arrivals: an exact copy (all 4 bands
    // equal — guaranteed drop), a light edit (high Jaccard), a same-
    // vocabulary reshuffle, a fresh doc, and a sub-3-token doc (no
    // signature, must pass).
    val histText = (0 until 40).map(i => s"hist$i").mkString(" ")
    val arrivals = Seq(
      1L -> histText,
      2L -> ((0 until 38).map(i => s"hist$i").mkString(" ") + " edit1 edit2"),
      3L -> (0 until 40).map(i => s"hist${(i * 7) % 40}").mkString(" "),
      4L -> (0 until 40).map(i => s"fresh$i").mkString(" "),
      5L -> "two tokens")
    val history = Seq(100L -> histText).toDF("doc_id", "text")
    // EXPECTED drops from the batch chain's own band values: arrival a is
    // dropped iff it shares a band key with the history — by the
    // one-definition contract this is exactly q35 candidacy vs doc 100
    val histBands = graft.operators.DedupOps.minhashBandValues(history)
      .select("band").collect().map(_.getString(0)).toSet
    val arrBands = graft.operators.DedupOps.minhashBandValues(
      arrivals.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expectDrop = arrBands.filter(b => histBands.contains(b._2)).map(_._1).toSet
    assert(expectDrop.contains(1L), "an exact copy must share every band")
    assert(!expectDrop.contains(4L) && !expectDrop.contains(5L))
    // cross-check candidacy against the REAL batch q35 over the union
    val tmp = java.nio.file.Files.createTempDirectory("graft_mhgate")
    ((100L -> histText) +: arrivals)
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val cand = graft.operators.DedupOps.queries("q35_minhash_lsh")(sp, tmp.toString)
    val vsHistory = cand.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if a == 100L || b == 100L => if (a == 100L) b else a }
      .toSet
    cand.unpersist(blocking = true)
    assert(vsHistory === expectDrop,
      "band-key intersection must equal batch q35 candidacy vs the history doc")
    // the gate itself, streaming
    val bloom = graft.operators.DedupOps.minhashBandValues(history)
      .stat.bloomFilter("band", 64L, 1e-6)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    val input = MemoryStream[Doc]
    val q = DocStreams.minhashBandGate(input.toDF(), bytes).writeStream
      .format("memory").queryName("mhgate").outputMode(OutputMode.Append()).start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        Doc(id, t, "en", "s", t.length, ts(f"2024-01-01 10:0$i%01d:00")) }: _*)
      q.processAllAvailable()
      val admitted = sp.sql("SELECT doc_id FROM mhgate").collect().map(_.getLong(0)).toSet
      assert(admitted === arrivals.map(_._1).toSet -- expectDrop,
        s"gate admissions must be exactly the non-candidates (expected drops: $expectDrop)")
    } finally q.stop()
    sp.catalog.clearCache()
  }

  test("windowed admission counts aggregate per source and hour") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStreams.admissionCounts(input.toDF()).writeStream
      .format("memory").queryName("admissions").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Doc(1, goodText, "en", "srcA", 1, ts("2024-01-01 10:05:00")),
        Doc(2, goodText, "en", "srcA", 1, ts("2024-01-01 10:55:00")),
        Doc(3, goodText, "en", "srcB", 1, ts("2024-01-01 10:20:00")),
        Doc(4, goodText, "en", "srcA", 1, ts("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val rows = sp.sql(
        "SELECT source, n_admitted FROM admissions ORDER BY hour, source")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows === Seq(("srcA", 2L), ("srcB", 1L), ("srcA", 1L)))
    } finally q.stop()
  }

  test("semantic decontam gate parity: stream drops ⟺ batch q119 contaminated") {
    import org.apache.spark.sql.functions.col
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val d = "/root/testdata/sf0.001"
    val probes = graft.operators.SimilarityOps.collectProbes(sp, d)
    assert(probes.size === 50)
    // EXPECTED drops from the REAL batch q119 over the same dir (the
    // one-definition contract: same probes, same bar, same rounded cosine)
    val flagged = graft.operators.SimilarityOps
      .queries("q119_semantic_decontam")(sp, d)
      .filter(col("contaminated") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val corpus = sp.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= 50).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val probe0 = sp.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    // arrivals: the whole corpus, a planted exact probe copy (cos 1.0 →
    // guaranteed drop), and the keyless/zero-norm edge rows (must pass —
    // the explicit __nrm > 0 guard, not NaN luck)
    val arrivals: Seq[(Long, Seq[Float])] = corpus ++ Seq(
      (9001L, probe0),
      (9002L, null: Seq[Float]),
      (9003L, Seq.empty[Float]),
      (9004L, Seq.fill(64)(0f)))
    val input = MemoryStream[(Long, Seq[Float])]
    val gated = DocStreams.semanticDecontamGate(
      input.toDF().toDF("vec_id", "embedding"), probes)
    val q = gated.writeStream.format("memory").queryName("semgate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      val admitted = sp.sql("SELECT vec_id FROM semgate").collect()
        .map(_.getLong(0)).toSet
      assert(!admitted.contains(9001L), "exact probe copy must be dropped")
      val expect = (corpus.map(_._1).toSet -- flagged) ++ Set(9002L, 9003L, 9004L)
      assert(admitted === expect,
        s"drops must be exactly batch q119's contaminated set (${flagged.size} ids)")
    } finally q.stop()
  }

  test("perceptual gate drops exactly the band-sharing assets; decode failures pass (q105 contract)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // history: one asset. Arrivals: an exact hash copy (all 4 bands), a
    // true near-dup at Hamming 3 (pigeonhole: >=1 intact band), a far
    // value sharing ONLY band 0 (conservative candidate-level drop), a
    // fresh value sharing nothing, and a decode failure (-1, must pass).
    val h = 0x00ABCDEF012345L
    val near = h ^ (7L << 20)          // 3 bits inside band 1 -> bands 0,2,3 intact
    val bandShare = (0x5A5A5AL << 32) | (h & 0x3FFFL) // band 0 equal, rest far
    val fresh = 0x00111111111111L ^ h  // no band in common with h (checked below)
    val history = Seq(100L -> h).toDF("doc_id", "dhash")
    val arrivals = Seq(1L -> h, 2L -> near, 3L -> bandShare, 4L -> fresh, 5L -> -1L)
    // EXPECTED drops from the batch chain's own band keys: arrival a is
    // dropped iff it shares a band key with history -- by the
    // one-definition contract this is exactly q105 candidacy vs doc 100
    val histBands = graft.operators.MultimodalOps.hammingBandValues(history)
      .select("band").collect().map(_.getString(0)).toSet
    assert(histBands.size === 4)
    val arrBands = graft.operators.MultimodalOps.hammingBandValues(
      arrivals.toDF("doc_id", "dhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expectDrop = arrBands.filter(b => histBands.contains(b._2)).map(_._1).toSet
    assert(expectDrop === Set(1L, 2L, 3L), s"fixture geometry broke: $expectDrop")
    // cross-check candidacy against the REAL batch pair stage over the
    // union: every dropped arrival must be a hammingNearDup candidate
    // (and the verified Hamming<=3 pairs are a subset of the drops)
    val union = (Seq(100L -> h) ++ arrivals).toDF("doc_id", "dhash")
    val verified = graft.operators.MultimodalOps.hammingNearDup(union).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if a == 100L || b == 100L => if (a == 100L) b else a }
      .toSet
    assert(verified === Set(1L, 2L), "Hamming<=3 verifies the copy and the near-dup only")
    assert(verified.subsetOf(expectDrop), "gate recall: every verified pair is dropped")
    // the gate itself, streaming
    val bloom = graft.operators.MultimodalOps.hammingBandValues(history)
      .stat.bloomFilter("band", 64L, 1e-6)
    val bytes = graft.functions.BloomFunctions.serialize(bloom)
    val input = MemoryStream[MediaHash]
    val q = DocStreams.perceptualNearDupGate(input.toDF(), bytes).writeStream
      .format("memory").queryName("pgate").outputMode(OutputMode.Append()).start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, dh), i) =>
        MediaHash(id, dh, ts(f"2024-01-01 10:0$i%01d:00")) }: _*)
      q.processAllAvailable()
      val admitted = sp.sql("SELECT doc_id FROM pgate").collect().map(_.getLong(0)).toSet
      assert(admitted === arrivals.map(_._1).toSet -- expectDrop,
        s"gate admissions must be exactly the non-candidates (expected drops: $expectDrop)")
    } finally q.stop()
    sp.catalog.clearCache()
  }

  test("sharded band-gate filters equal the single-filter gate (2 GB-ceiling escape)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // a history big enough that its band keys spread across all 3 shards
    val history = (0 until 40).map { g =>
      (1000L + g) -> (0 until 40).map(i => s"h${g}_$i").mkString(" ")
    }.toDF("doc_id", "text")
    val bands = graft.operators.DedupOps.minhashBandValues(history)
    val nKeys = bands.select("band").distinct().count()
    val shards = DocStreams.bloomShards(bands, "band", 3, nKeys, 1e-6)
    assert(shards.size === 3)
    // per-shard key counts must partition the key set (xxhash64 spread)
    val perShard = bands.select("band").distinct()
      .groupBy(pmod(xxhash64(col("band")), lit(3)).as("s")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard.keySet === Set(0L, 1L, 2L), s"degenerate shard spread: $perShard")
    // arrivals: an exact copy of one history doc (must drop), a fresh doc
    // (must pass), a sub-3-token doc (no signature, must pass)
    val histText = history.collect()(7).getString(1)
    val arrivals = Seq(
      1L -> histText,
      2L -> (0 until 40).map(i => s"fresh$i").mkString(" "),
      3L -> "two tokens")
    val arrDf = arrivals.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val shardedAdmit = DocStreams.minhashBandGateSharded(arrDf, shards)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference: the single-filter gate over the same history
    val one = graft.operators.DedupOps.minhashBandValues(history)
      .stat.bloomFilter("band", nKeys, 1e-6)
    val singleAdmit = DocStreams.minhashBandGate(arrDf,
      graft.functions.BloomFunctions.serialize(one))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shardedAdmit === singleAdmit,
      s"sharded gate diverged: sharded=$shardedAdmit single=$singleAdmit")
    assert(shardedAdmit === Set(2L, 3L), "copy dropped, fresh + short pass")
    sp.catalog.clearCache()
  }
}
