package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupOps, IvfPqIndexStore, SimilarityOps}

/** The one-call intake topology (r15): the fixture corpus replayed
  * through [[IntakeTopology.textIntake]] must produce batch q113's
  * accounting, a curation store equal to the batch-built one, and a
  * dedup manifest that serves the next dump's delta verdicts — with the
  * auto-compaction bar arming mid-stream; the vector wing must gate,
  * append and ledger; attach is all-or-nothing on the leases.
  */
class IntakeTopologySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_topo_$tag").toString

  test("text wing end to end: accounting, curation store, manifest, auto-compaction") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val root = tmpRoot("text")
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val grams = docs.filter(col("doc_id") < 10)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(explode(array_distinct(expr(DedupOps.gram5ArrayExpr("t")))).as("g"))
      .distinct()
    val evalBloom = graft.functions.BloomFunctions.serialize(
      grams.stat.bloomFilter("g", math.max(grams.count(), 1L) * 8, 1e-9))

    val corpus = docs.filter(col("doc_id") >= 10)
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0)).map(r => WfDoc(r.getLong(0), r.getString(1)))
    val got = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val seen = scala.collection.mutable.Set[Long]()
    val input = MemoryStream[WfDoc]
    // auto-compaction bar 2: the third trigger's applied epoch crosses it
    val q = IntakeTopology.textIntake(input.toDF(), evalBloom, root,
      autoCompactEpochs = 2) { (counts, epoch) =>
      if (seen.add(epoch)) counts.collect().foreach { r =>
        got(r.getString(0)) += r.getLong(1)
      }
    }.start()
    try corpus.grouped(corpus.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    IntakeTopology.releaseAll(sp, root)

    // 1. accounting == batch q113
    val want = graft.operators.TextOps.pipelineWaterfall(docs)
      .groupBy("stage").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.toMap === want, s"topology accounting diverged: $got vs $want")

    // 2. the curation store the wing maintained == the batch-built one
    val batchDir = tmpRoot("batchcur")
    CurationStore.materialize(sp, d, batchDir)
    assert(
      CurationStore.textLog(sp, IntakeTopology.curationDir(root))
        .collect().map(_.toSeq).toSet ===
        CurationStore.textLog(sp, batchDir).collect().map(_.toSeq).toSet,
      "topology-maintained text log diverged from the batch builder")

    // 3. the manifest holds exactly the KEPT documents' tables and serves
    // the next dump's delta verdicts == the per-batch recompute
    val keptIds = graft.operators.TextOps.pipelineWaterfall(docs)
      .filter(col("stage") === "kept").select("doc_id")
    val keptDocs = docs.join(keptIds, "doc_id").select("doc_id", "text")
    val arrivals = docs.filter(col("doc_id") >= 10 && col("doc_id") < 60)
      .select(col("doc_id") + 100000, col("text")).toDF("doc_id", "text")
    val verify = keptDocs.unionByName(arrivals)
    val served = DedupManifest.deltaDedupAgainstManifest(
      arrivals, IntakeTopology.manifestDir(root), verify)
    val recomputed = DedupOps.deltaDedupCore(arrivals,
      DedupOps.historyFpTable(keptDocs),
      DedupOps.historyBandTable(keptDocs), verify)
    assert(served.collect().map(_.toSeq).toSet ===
      recomputed.collect().map(_.toSeq).toSet,
      "manifest-served delta verdicts diverged from the recompute")

    // 4. the auto-compaction bar fired mid-stream (3 triggers, bar 2)
    assert(IvfPqIndexStore.committedVersion(
      sp, IntakeTopology.manifestDir(root)) >= 1L,
      "the topology's manifest auto-compaction never fired")
    sp.catalog.clearCache()
  }

  test("vector wing: health gate + admission + leased ledgered append") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val root = tmpRoot("vec")
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(j => ((id % 10) * 2.0 + ((id * 13 + j * 7) % 11) / 11.0))
    val base = (0L until 40L).map(i => (i, i % 10, vec(i)))
      .toDF("vec_id", "label", "e")
    graft.functions.VectorFunctions.register(sp)
    SimilarityOps.saveIvfPqIndexFrom(base, IntakeTopology.indexDir(root))
    // bar between an exact copy's distortion and a far outlier
    val bar = SimilarityOps.searchSavedIvfPqFor(
      Seq((9999L, vec(5))).toDF("qid", "qe"),
      IntakeTopology.indexDir(root), nProbes = 2, k = 1)
      .collect()(0).getAs[Double]("adist") + 1.0

    val applied = scala.collection.mutable.Set[Long]()
    val input = MemoryStream[(Long, Long, Array[Double])]
    // the fixture vectors are unnormalized (norms ~60-130) — the health
    // gate's norm band widens accordingly; NaN still fails `nonfinite`
    val q = IntakeTopology.vectorIntake(
      input.toDF().toDF("vec_id", "label", "e"), root, bar,
      loNorm = 1.0, hiNorm = 1000.0) {
      (df, _) => applied ++= df.select("vec_id").collect().map(_.getLong(0))
    }.start()
    try {
      input.addData(
        (1000L, 3L, vec(5)),                       // indexed near-dup → drop
        (2000L, 7L, vec(7).map(_ + 100.0)),        // novel → admit
        (3000L, 1L, Array.fill(64)(Double.NaN)))   // corrupt → health gate
      q.processAllAvailable()
    } finally q.stop()
    IntakeTopology.releaseAll(sp, root)
    assert(applied.toSet === Set(2000L),
      s"admitted set through health+ANN gates, got $applied")
    val rdir = IvfPqIndexStore.resolveRead(sp, IntakeTopology.indexDir(root))
    val cids = sp.read.parquet(s"$rdir/codes").select("cid")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(cids.contains(2000L) && !cids.contains(1000L) && !cids.contains(3000L),
      "index state must hold exactly the admitted vector")
    assert(IvfPqIndexStore.readLedger(sp, rdir).get
      .filter(!col("folded")).select("cid").collect().map(_.getLong(0)).toSet
      === Set(2000L), "the ledger must attribute the admitted vector")
    sp.catalog.clearCache()
  }

  test("attach is all-or-nothing: a second topology fails by name, first claim not orphaned") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val root = tmpRoot("lease")
    val bloom = graft.functions.BloomFunctions.serialize(
      org.apache.spark.util.sketch.BloomFilter.create(10, 0.01))
    val input = MemoryStream[WfDoc]
    IntakeTopology.textIntake(input.toDF(), bloom, root)()
    val e = intercept[IllegalStateException] {
      IntakeTopology.textIntake(input.toDF(), bloom, root)()
    }
    assert(e.getMessage.contains("curation-store") ||
      e.getMessage.contains("dedup-manifest"))
    IntakeTopology.releaseAll(sp, root)
    // a half-attach (manifest pre-claimed by someone else) must release
    // the curation claim it made before failing
    IvfPqIndexStore.acquireLease(sp, IntakeTopology.manifestDir(root),
      "foreign", "dedup-manifest")
    intercept[IllegalStateException] {
      IntakeTopology.textIntake(input.toDF(), bloom, root)()
    }
    assert(IvfPqIndexStore.leaseHolder(
      sp, IntakeTopology.curationDir(root)).isEmpty,
      "failed attach orphaned the curation lease")
    IvfPqIndexStore.releaseLease(sp, IntakeTopology.manifestDir(root))
  }
}
