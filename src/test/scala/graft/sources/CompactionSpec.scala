package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.readstat.Compaction

/** Sink-directory compaction (r11): fold old `part-e<epoch>-<pid>`
  * containers into consolidated `compact-e<lo>-e<hi>-*` containers behind
  * an atomic `.done` marker. The spec drives the REAL pipeline — streaming
  * sink epochs in, `Compaction.compact`, multi-file batch load out — and
  * then pins the reader's behavior at every crash point of the swap
  * (uncommitted set ignored; committed set preferred with old parts still
  * present; retired narrower set ignored), because the whole design is
  * that readers are correct at every intermediate state without a
  * manifest.
  */
class CompactionSpec extends SparkSpec {

  final case class Rec(x: Double, s: String)

  private def names(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().map(_.getName).toSeq.sorted

  private def readBack(dir: String): Seq[(Double, String)] = {
    val back = spark.read.format("readstat").load(dir)
    back.select("x", "s").collect().map(r => (r.getDouble(0), r.getString(1)))
      .toSeq.sortBy(_._1)
  }

  private def expected(n: Int): Seq[(Double, String)] =
    (0 until n).map(i => (i.toDouble, s"r$i"))

  /** Run a MemoryStream through the readstat sink, one epoch per batch. */
  private def writeEpochs(dir: String, batches: Seq[Seq[Rec]]): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val ckpt = Files.createTempDirectory("graft_compact_ckpt").toString
    val input = MemoryStream[Rec]
    // several parts per epoch, like a real multi-partition intake
    val q = input.toDF().repartition(3).writeStream
      .format("readstat").option("format", "dta")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start(dir)
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("fold old epochs: same rows back, fewer files, newest epoch untouched") {
    val dir = Files.createTempDirectory("graft_compact").toString
    writeEpochs(dir, Seq(
      (0 until 100).map(i => Rec(i.toDouble, s"r$i")),
      (100 until 200).map(i => Rec(i.toDouble, s"r$i")),
      (200 until 250).map(i => Rec(i.toDouble, s"r$i"))))
    val before = names(dir).filter(_.endsWith(".dta"))
    val epochsBefore = before.filter(_.startsWith("part-e"))
      .map(_.take("part-e000000".length)).distinct
    assert(epochsBefore.length >= 3, s"need >=3 epochs, got $before")
    val newest = epochsBefore.max

    val r = Compaction.compact(spark, dir, keep = 1)
    assert(r.isDefined, "three epochs at keep=1 must fold")
    assert(r.get.rows === 200, "folded rows are the two old epochs")
    assert(r.get.foldedEpochs === 2)

    val after = names(dir)
    // newest epoch's parts survive verbatim; older epochs' parts are gone
    assert(after.filter(_.startsWith("part-e")).forall(_.startsWith(newest)),
      s"only the newest epoch may keep parts, got $after")
    assert(after.exists(_.matches("""compact-e\d+-e\d+\.done""")), s"marker missing: $after")
    assert(after.exists(_.matches("""compact-e\d+-e\d+-\d+\.dta""")), s"compact parts missing: $after")
    assert(readBack(dir) === expected(250))

    // idempotent: nothing further to fold (one set + one kept epoch)
    assert(Compaction.compact(spark, dir, keep = 1).isEmpty)
    assert(readBack(dir) === expected(250))
  }

  test("uncommitted compact files (no marker) are invisible to the load") {
    val dir = Files.createTempDirectory("graft_compact_nomark").toString
    writeEpochs(dir, Seq(
      (0 until 50).map(i => Rec(i.toDouble, s"r$i")),
      (50 until 80).map(i => Rec(i.toDouble, s"r$i"))))
    // simulate a compactor crash after staging but before the marker: a
    // stray container full of OTHER rows under a compact name
    val tmp = Files.createTempDirectory("graft_compact_stray").resolve("stray.dta").toString
    spark.range(1).selectExpr("CAST(999 AS DOUBLE) AS x", "'ghost' AS s")
      .write.format("readstat").mode("overwrite").save(tmp)
    Files.copy(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(dir, "compact-e000000-e000000-00000.dta"))

    assert(readBack(dir) === expected(80), "uncommitted compact file must be ignored")

    // the next run sweeps it and folds for real
    val r = Compaction.compact(spark, dir, keep = 1)
    assert(r.isDefined)
    assert(names(dir).exists(_.matches("""compact-e\d+-e\d+\.done""")))
    assert(readBack(dir) === expected(80))
  }

  test("marker present with old parts still present: reads exactly once") {
    val dir = Files.createTempDirectory("graft_compact_mid").toString
    writeEpochs(dir, Seq(
      (0 until 60).map(i => Rec(i.toDouble, s"r$i")),
      (60 until 90).map(i => Rec(i.toDouble, s"r$i")),
      (90 until 100).map(i => Rec(i.toDouble, s"r$i"))))
    val r = Compaction.compact(spark, dir, keep = 1)
    assert(r.isDefined)
    // resurrect a retired epoch part next to the committed marker — the
    // post-commit crash window where deletes did not finish
    val tmp = Files.createTempDirectory("graft_compact_old").resolve("old.dta").toString
    spark.range(1).selectExpr("CAST(0 AS DOUBLE) AS x", "'r0' AS s")
      .write.format("readstat").mode("overwrite").save(tmp)
    Files.copy(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(dir, "part-e000000-99.dta"))

    assert(readBack(dir) === expected(100),
      "epoch parts covered by an active marker must not double-count")
  }

  test("re-compaction folds the prior set and retires it by subsumption") {
    val dir = Files.createTempDirectory("graft_compact_fold").toString
    writeEpochs(dir, Seq(
      (0 until 40).map(i => Rec(i.toDouble, s"r$i")),
      (40 until 70).map(i => Rec(i.toDouble, s"r$i"))))
    assert(Compaction.compact(spark, dir, keep = 1).isDefined)
    // two more epochs arrive on the SAME checkpoint lineage being
    // unavailable (MemoryStream restarts at epoch 0) — stage them as a
    // fresh sink run into a scratch dir, then move them in as later epochs,
    // the shape a long-running intake produces
    val scratch = Files.createTempDirectory("graft_compact_more").toString
    writeEpochs(scratch, Seq(
      (70 until 95).map(i => Rec(i.toDouble, s"r$i")),
      (95 until 110).map(i => Rec(i.toDouble, s"r$i"))))
    names(scratch).filter(_.startsWith("part-e")).foreach { n =>
      // bump the fresh run's epochs by 10: e000000->e000010, e000001->e000011
      val ep = n.substring("part-e".length, "part-e".length + 6).toInt + 10
      val nn = f"part-e$ep%06d-" + n.substring("part-e000000-".length)
      Files.move(java.nio.file.Paths.get(scratch, n), java.nio.file.Paths.get(dir, nn))
    }
    assert(readBack(dir) === expected(110))

    val r2 = Compaction.compact(spark, dir, keep = 1)
    assert(r2.isDefined)
    assert(r2.get.foldedSets === 1, "the prior compact set must fold in")
    val after = names(dir)
    val markers = after.filter(_.endsWith(".done"))
    assert(markers.length === 1, s"narrower marker must be retired, got $markers")
    assert(readBack(dir) === expected(110))
    // and the kept (newest) epoch is still parts, not folded
    assert(after.exists(_.startsWith("part-e")), s"newest epoch folded: $after")
  }

  test("a tailing source never admits compaction rewrites") {
    assert(Compaction.isCompactionFile("compact-e000000-e000005-00001.dta"))
    assert(Compaction.isCompactionFile("compact-e000000-e000005.done"))
    assert(Compaction.isCompactionFile("compact-e000000-e000005.v2-00001.dta"))
    assert(Compaction.isCompactionFile("compact-e000000-e000005.v2.done"))
    assert(!Compaction.isCompactionFile("part-e000003-7.dta"))
    assert(!Compaction.isCompactionFile("monthly_2020.dta"))
  }

  test("re-shard in place: smaller byte target splits one set at version+1") {
    val dir = Files.createTempDirectory("graft_compact_reshard").toString
    writeEpochs(dir, Seq(
      (0 until 400).map(i => Rec(i.toDouble, s"r$i")),
      (400 until 800).map(i => Rec(i.toDouble, s"r$i")),
      (800 until 850).map(i => Rec(i.toDouble, s"r$i"))))
    assert(Compaction.compact(spark, dir, keep = 1).isDefined)
    val v1Files = names(dir).filter(_.matches("""compact-e\d+-e\d+-\d+\.dta"""))
    assert(v1Files.size === 1, s"default target folds to one file: $v1Files")
    // same range, same target: idempotent no-op
    assert(Compaction.compact(spark, dir, keep = 1).isEmpty)
    // a tiny byte target must SPLIT the oversized set — previously
    // impossible (same range ⇒ same marker name; subsumption only widens)
    val r = Compaction.compact(spark, dir, keep = 1, targetBytes = 4096)
    assert(r.isDefined, "re-shard to a smaller target must run")
    assert(r.get.outputFiles > 1, s"expected a split, got $r")
    assert(r.get.rows === 800)
    val after = names(dir)
    val markers = after.filter(_.endsWith(".done"))
    assert(markers.length === 1 && markers.head.contains(".v2."),
      s"v2 marker must retire v1: $markers")
    assert(after.count(_.matches("""compact-e\d+-e\d+\.v2-\d+\.dta""")) ===
      r.get.outputFiles)
    assert(v1Files.forall(f => !after.contains(f)), "v1 files must be swept")
    assert(readBack(dir) === expected(850))
    // repeated calls at the same target CONVERGE (per-container header
    // overhead can shift total bytes once more, so allow a settling pass)
    var settles = 0
    while (Compaction.compact(spark, dir, keep = 1, targetBytes = 4096).isDefined) {
      settles += 1
      assert(settles <= 2, "re-shard at a fixed target must converge")
    }
    assert(readBack(dir) === expected(850))
    assert(names(dir).count(_.endsWith(".done")) === 1)
  }

  test("higher-version set is invisible until ITS marker lands; then it wins") {
    // pure filter-level pin of the version-commit crash window
    val v1 = Seq("compact-e000000-e000004-00000.dta",
      "compact-e000000-e000004.done")
    val staged = Seq("compact-e000000-e000004.v2-00000.dta",
      "compact-e000000-e000004.v2-00001.dta")
    val parts = Seq("part-e000005-0.dta")
    // staged v2 files, v2 marker NOT yet created: v1 still serves
    assert(Compaction.filterNames(v1 ++ staged ++ parts) ===
      Set("compact-e000000-e000004-00000.dta", "part-e000005-0.dta"))
    // marker created: v2 serves, v1 files (and marker) are garbage
    val committed = v1 ++ staged ++ parts :+ "compact-e000000-e000004.v2.done"
    assert(Compaction.filterNames(committed) ===
      (staged.toSet + "part-e000005-0.dta"))
  }

  test("plain (non-sink) directories are untouched by the filter") {
    val keep = Compaction.filterNames(Seq("a.dta", "b.sav", "part-00003.dta"))
    assert(keep === Set("a.dta", "b.sav", "part-00003.dta"))
  }
}
