package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q134 cross-modal keeper consistency: a planted split identity — a doc
  * whose text resolves to keeper A while its image resolves to B's
  * representative — must surface as a split, agreements as agreements,
  * and docs missing either identity must not be compared at all.
  */
class KeeperConsistencySpec extends SparkSpec {

  test("planted split identity surfaces; agreements count as agreements") {
    val sp = spark
    import sp.implicits._
    // gate-passing texts (80 tokens, leading stopwords — the
    // WaterfallAccountingSpec construction)
    val textA = (Array("the", "and") ++ Array.fill(78)("data")).mkString(" ")
    val textC = (Array("the", "and") ++ Array.fill(78)("info")).mkString(" ")
    val docs = Seq(
      (10L, textA), // text keeper 10, stage kept
      (11L, textA + "!!!"), // same fp → text keeper 10, stage dedup
      (12L, textC), // unique → text keeper 12, stage kept
      (13L, "too short")) // gate-failer: no text identity, never compared
      .toDF("doc_id", "text")
    val media = Seq(
      ("image", 10L, "kept", Some(10L)), // text 10 == media 10 → agree
      ("image", 11L, "exact_dup", Some(12L)), // text 10 vs media 12 → SPLIT
      ("image", 12L, "kept", Some(12L)), // agree
      ("image", 13L, "kept", Some(13L)), // text side absent → excluded
      ("audio", 10L, "decode", None: Option[Long])) // no media identity → excluded
      .toDF("kind", "doc_id", "stage", "kept_id")
    val got = MultimodalOps.keeperConsistencyFrom(docs, media)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      ("image", "dedup", 1L, 0L, 1L),
      ("image", "kept", 2L, 2L, 0L)))
    spark.catalog.clearCache()
  }

  test("fixture corpus: every compared doc is agree or split, never both") {
    val d = "/root/testdata/sf0.001"
    val rows = MultimodalOps.queries("q134_keeper_consistency")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) + r.getLong(4),
        s"n_docs must equal n_agree + n_split: $r")
    }
    // the fixture's %300 media classes merge docs whose texts are unique —
    // splits must actually occur, or the check is vacuous here
    assert(rows.map(_.getLong(4)).sum > 0L,
      "fixture must exhibit at least one split identity")
    spark.catalog.clearCache()
  }
}
