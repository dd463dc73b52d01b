package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q112 incremental delta dedup on a planted corpus: every disposition
  * (exact_dup / batch_dup / near_dup / new) fires where planted, priority
  * order holds (history beats batch), keepers are the documented minima,
  * and the short-doc no-signature path degrades to 'new' instead of
  * erroring. The doc_id%10 split puts {0,10,20,...} in history and
  * {8,18,28,...} in the arrival batch.
  */
class DeltaDedupSpec extends SparkSpec {

  private val baseA = (0 until 50).map(i => s"a$i").mkString(" ")
  // one token changed at the END: 3 of 48 shingles differ → Jaccard ≈ 0.88,
  // and the minhash lanes (min over 45 shared shingles) overwhelmingly
  // survive, so at least one of the 4 bands matches
  private val nearA = ((0 until 49).map(i => s"a$i") :+ "zz").mkString(" ")
  private val textB = (100 until 150).map(i => s"b$i").mkString(" ")
  private val textC = (200 until 250).map(i => s"c$i").mkString(" ")

  test("q112: all four dispositions, priority order, and minimum keepers") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q112")
    val docs = Seq(
      // history (doc_id % 10 < 8)
      (0L, baseA, "en", "s0", baseA.length.toLong),
      (10L, textB, "en", "s0", textB.length.toLong),
      (20L, baseA, "en", "s1", baseA.length.toLong), // hist-internal dup of A
      // arrivals (doc_id % 10 >= 8)
      (8L, baseA, "en", "s0", baseA.length.toLong),  // exact dup of history
      (98L, baseA, "en", "s1", baseA.length.toLong), // exact beats batch-dup-with-8
      (18L, textC, "en", "s0", textC.length.toLong), // batch keeper, novel
      (28L, textC, "en", "s1", textC.length.toLong), // batch dup of 18
      (38L, nearA, "en", "s0", nearA.length.toLong), // near dup of history A
      (48L, "tiny doc", "en", "s0", 8L))             // <3 tokens: no signature
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(tmp.resolve("documents.parquet").toString)

    val out = DedupOps.deltaDedup(sp, tmp.toString).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // one row per arrival, none for history
    assert(out.keySet == Set(8L, 18L, 28L, 38L, 48L, 98L))
    // exact dups point at the MINIMUM historical holder (0, not 20), and
    // history-priority holds even though 8 and 98 also share a batch fp
    assert(out(8L) == (("exact_dup", 0L)))
    assert(out(98L) == (("exact_dup", 0L)))
    // within-batch: min arrival keeps, the rest point at it
    assert(out(28L) == (("batch_dup", 18L)))
    // the batch keeper is genuinely novel → new
    assert(out(18L) == (("new", -1L)))
    // near dup: banded match + verified Jaccard ≥ 0.5 against history,
    // match = minimum verified historical doc (0 and 20 both verify)
    assert(out(38L) == (("near_dup", 0L)))
    // short doc: no shingles, no signature — degrades to new, no error
    assert(out(48L) == (("new", -1L)))
  }

  test("q112 broadcast guard: an over-bar candidate set degrades to a shuffle join, rows identical") {
    // the r12 verdict's watch item: the candidate-id union is delta-BOUNDED
    // but not delta-SIZED — a pathological batch (mass re-upload where
    // every survivor band-collides with history) can exceed the broadcast
    // budget. The guard must DEGRADE (shuffle join), never change results:
    // drive the seam with bar 0 so every candidate trips it and pin row
    // equality against the broadcast path on the sf fixture (which has
    // real band-collision candidates — q112's near_dup rows are nonempty).
    val sp = spark
    val d = "/root/testdata/sf0.001"
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val bc = DedupOps.deltaDedupFrom(docs)
    val bcRows = bc.collect().map(_.toSeq).toSet
    bc.unpersist(blocking = true)
    val sj = DedupOps.deltaDedupFrom(docs, maxBroadcastIds = 0L)
    val sjRows = sj.collect().map(_.toSeq).toSet
    sj.unpersist(blocking = true)
    assert(bcRows.nonEmpty)
    assert(sjRows === bcRows, "shuffle-join degrade changed the disposition rows")
    sp.catalog.clearCache()
  }
}
