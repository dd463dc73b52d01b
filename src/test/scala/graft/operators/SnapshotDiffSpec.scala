package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q138 snapshot diff: the status partition recomputed independently from
  * the raw documents table, planted per-document cases for every status,
  * and the generic operator over two explicit frames.
  */
class SnapshotDiffSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  /** (doc_id, source) -> status, recomputed in plain Scala from the
    * fixture's modulus conventions.
    */
  private def expected(): Map[(Long, String), String] = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.flatMap { case (id, src) =>
      val inOld = id % 7 != 0
      val inNew = id % 13 != 0
      val changed = id % 11 == 0
      val status =
        if (!inOld && !inNew) None
        else if (!inOld) Some("added")
        else if (!inNew) Some("removed")
        else if (changed) Some("changed")
        else Some("unchanged")
      status.map(st => (id, src) -> st)
    }.toMap
  }

  test("q138 cell counts equal the independent per-document recompute") {
    val exp = expected()
      .groupBy { case ((_, src), st) => (src, st) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val got = StatsOps.queries("q138_snapshot_diff")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === exp)
    // every source shows all four statuses on this corpus (moduli are
    // source-independent), so the report is a full matrix
    val sources = exp.keys.map(_._1).toSet
    assert(got.keySet === sources.flatMap(s =>
      Seq("added", "removed", "changed", "unchanged").map(st => (s, st))))
  }

  test("q138 witnesses: first/last doc ids per cell match the recompute") {
    val exp = expected()
    val byCell = exp.toSeq.groupBy { case ((_, src), st) => (src, st) }
    StatsOps.queries("q138_snapshot_diff")(spark, d).collect().foreach { r =>
      val cell = (r.getString(0), r.getString(1))
      val ids = byCell(cell).map(_._1._1)
      assert(r.getLong(3) === ids.min, s"first_doc mismatch at $cell")
      assert(r.getLong(4) === ids.max, s"last_doc mismatch at $cell")
    }
  }

  test("planted cases: add/remove/change/absent precedence on explicit frames") {
    import spark.implicits._
    // old snapshot: docs 1,2,3 — new: 2 (changed), 3 (same), 4 (added);
    // doc 1 removed, doc 5 in neither
    val old = Seq((1L, "s", "a"), (2L, "s", "b"), (3L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val neu = Seq((2L, "s", "B"), (3L, "s", "c"), (4L, "s", "d"))
      .toDF("doc_id", "source", "text")
    val got = StatsOps.snapshotDiff(old, neu).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map(
      "added" -> ((1L, 4L, 4L)),
      "removed" -> ((1L, 1L, 1L)),
      "changed" -> ((1L, 2L, 2L)),
      "unchanged" -> ((1L, 3L, 3L))))
  }

  test("null text never reads as absence (presence is marker-keyed, r14 review)") {
    import spark.implicits._
    // doc 1: null text in old, real text in new -> changed (digest-keyed
    // presence misread this as 'added'); doc 2: null text BOTH sides ->
    // unchanged (null-safe digest compare); doc 3: null in old, absent
    // from new -> removed
    val old = Seq((1L, "s", null: String), (2L, "s", null: String),
      (3L, "s", null: String)).toDF("doc_id", "source", "text")
    val neu = Seq((1L, "s", "now real"), (2L, "s", null: String))
      .toDF("doc_id", "source", "text")
    val got = StatsOps.snapshotDiff(old, neu).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(got === Map("changed" -> 1L, "unchanged" -> 2L, "removed" -> 3L))
  }
}
