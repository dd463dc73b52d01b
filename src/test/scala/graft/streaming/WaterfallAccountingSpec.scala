package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupOps, TextOps}

/** Streaming composed-waterfall drop accounting (r13 verdict #3): the
  * per-trigger (stage, dropped, passed) report must reproduce batch
  * q113's stage accounting when the corpus streams through in arrival
  * order — the one-definition contract, pinned end to end on the real
  * fixture corpus and on a planted ladder that exercises every stage
  * across trigger boundaries.
  */
final case class WfDoc(doc_id: Long, text: String)

class WaterfallAccountingSpec extends SparkSpec {

  private def evalBloomOf(grams: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val n = math.max(grams.count(), 1L)
    // 8× expected-items headroom: at few-hundred-item builds the sketch
    // filter's REALIZED fp rate sits orders above its nominal fpp (one
    // measured FP in 24k probes at nominal 1e-9 on this corpus — the
    // optimal-k rounding bites hardest at tiny n), and the parity pin
    // needs a deterministically FP-free window; the over-drop contract
    // the gates document is exactly this sizing discipline.
    graft.functions.BloomFunctions.serialize(
      grams.stat.bloomFilter("g", n * 8, 1e-9))
  }

  private def gramsOf(docs: org.apache.spark.sql.DataFrame) = docs
    .select(split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 5)
    .select(explode(array_distinct(expr(DedupOps.gram5ArrayExpr("t")))).as("g"))
    .distinct()

  test("streamed corpus reproduces batch q113's stage accounting exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val evalBloom = evalBloomOf(gramsOf(docs.filter(col("doc_id") < 10)))

    val want = TextOps.pipelineWaterfall(docs)
      .groupBy("stage").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // replay the corpus in arrival (doc_id) order over three triggers —
    // the dedup keeper election must agree with batch across the seams
    val corpus = docs.filter(col("doc_id") >= 10)
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0)).map(r => WfDoc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[WfDoc]
    val got = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var dropped = 0L
    var passed = 0L
    // the sink's delivery contract is AT-LEAST-ONCE per epoch (foreachBatch
    // re-fires the last uncommitted epoch after a crash) — an accumulating
    // consumer dedups on the epoch id it is handed, as here
    val seenEpochs = scala.collection.mutable.Set[Long]()
    val q = DocStreams.waterfallAccountingSink(input.toDF(), evalBloom) {
      (counts, epoch) =>
        if (seenEpochs.add(epoch)) counts.collect().foreach { r =>
          got(r.getString(0)) += r.getLong(1)
          dropped += r.getLong(2)
          passed += r.getLong(3)
        }
    }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_wfacct").toString)
      .start()
    try corpus.grouped(corpus.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toMap === want,
      s"streamed accounting diverged from batch q113: got $got want $want")
    assert(dropped + passed === corpus.length.toLong,
      "every arriving doc is accounted exactly once")
    assert(passed === want.getOrElse("kept", 0L))
    sp.catalog.clearCache()
  }

  test("the stage ladder fires in order across trigger boundaries") {
    val sp = spark
    import sp.implicits._
    // gate-passing keeper text: 80 tokens, mean wlen in-range, 2 stopwords
    // (stopwords lead so punctuation-variant copies keep their gate bits)
    val keeperText = (Array("the", "and") ++ Array.fill(78)("data")).mkString(" ")
    // gate-passing but low-quality: 60 long tokens → 0.5 multiplier, 0.15
    val dullText = (Array("the", "and") ++ Array.fill(58)("datadatas")).mkString(" ")
    // contaminated keeper: carries the eval set's 5-gram verbatim
    val evalRun = "alpha beta gamma delta epsilon"
    val contamText = (Array("the", "and") ++ Array.fill(73)("data")).mkString(" ") +
      " " + evalRun
    val evalBloom = evalBloomOf(gramsOf(Seq(WfDoc(0L, evalRun)).toDF()))

    val stages = scala.collection.mutable.Map[Long, String]()
    // drive the seam directly: per-DOC stage labels, not just counts, with
    // the same history handoff the sink performs between triggers
    val hist = org.apache.spark.util.sketch.BloomFilter.create(1000, 1e-9)
    def runBatch(ds: Seq[WfDoc]): Unit = {
      val labeled = DocStreams.waterfallStageOf(ds.toDF(), evalBloom,
        graft.functions.BloomFunctions.serialize(hist), 0.25)
        .select("doc_id", "fp", "stage", "keeper").collect()
      labeled.foreach(r => stages(r.getLong(0)) = r.getString(2))
      labeled.filter(_.getBoolean(3)).foreach(r => hist.putString(r.getString(1)))
    }
    runBatch(Seq(
      WfDoc(100, keeperText), // elected keeper → kept
      WfDoc(101, keeperText + "!!!"), // same fp, same trigger → dedup
      WfDoc(102, "too short"), // gates
      WfDoc(103, contamText), // keeper but eval-gram hit → decontam
      WfDoc(104, dullText))) // keeper, clean, low quality → quality
    runBatch(Seq(
      WfDoc(200, keeperText + "??"), // keeper's fp from trigger 1 → dedup
      WfDoc(201, dullText + "."))) // dull fp claimed in trigger 1 → dedup
    assert(stages(100) === "kept")
    assert(stages(101) === "dedup")
    assert(stages(102) === "gates")
    assert(stages(103) === "decontam")
    assert(stages(104) === "quality")
    assert(stages(200) === "dedup", "history dedup across triggers")
    assert(stages(201) === "dedup",
      "a non-kept keeper still claims its fingerprint (q113's election)")
  }

  test("restart reseeds the history Bloom from the store's committed keepers") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val keeperText = (Array("the", "and") ++ Array.fill(78)("data")).mkString(" ")
    val evalBloom = evalBloomOf(gramsOf(Seq(WfDoc(0L, "zz yy xx ww vv")).toDF()))
    val dir = java.nio.file.Files.createTempDirectory("graft_wf_reseed").toString

    def runOnce(triggers: Seq[WfDoc]*): Map[String, Long] = {
      val input = MemoryStream[WfDoc]
      val got = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val q = DocStreams.waterfallAccountingSink(input.toDF(), evalBloom,
        persistTo = Some(dir)) { (counts, _) =>
        counts.collect().foreach(r => got(r.getString(0)) += r.getLong(1))
      }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_wf_reseed_ck").toString)
        .start()
      try triggers.foreach { t => input.addData(t: _*); q.processAllAvailable() }
      finally q.stop()
      CurationStore.releaseStoreLease(sp, dir)
      got.toMap
    }

    // first attach elects doc 100's fingerprint and persists the epoch
    assert(runOnce(Seq(WfDoc(100, keeperText))) === Map("kept" -> 1L))
    // a NEW sink on the same store (operator restart: fresh driver state)
    // must see that fingerprint as history — before the r15 ADVICE fix the
    // filter restarted empty and this punctuation-variant copy was re-KEPT.
    // (The fresh checkpoint restarts epoch ids at 0, which the ledger's
    // replay guard skips for the APPEND — the throwaway first trigger
    // burns that id so doc 200's trigger lands as a new epoch.)
    assert(runOnce(Seq(WfDoc(199, "too short")),
      Seq(WfDoc(200, keeperText + "!!"))) ===
      Map("gates" -> 1L, "dedup" -> 1L),
      "restarted sink re-admitted a historical duplicate — Bloom not reseeded")
    // the log's keeper map still points every copy at the original keeper
    val served = CurationStore.textKeeperMapServed(sp, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served === Map(100L -> 100L, 200L -> 100L))
    sp.catalog.clearCache()
  }
}
