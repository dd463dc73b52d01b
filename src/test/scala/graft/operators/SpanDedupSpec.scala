package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for q80 span-removal dedup (C4-style duplicate-span
  * removal): first-occurrence wins corpus-wide, later copies are rewritten
  * out, reassembly preserves in-document order, and a fully-duplicated
  * document survives as an empty row rather than disappearing.
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // 10-token spans; build texts from single-char tokens repeated
  private def span(tok: String): String = Seq.fill(10)(tok).mkString(" ")

  test("a later document quoting an earlier span loses the span, keeps its own prose") {
    val docs = Seq(
      (1L, span("a") + " " + span("b")),       // original: spans A, B
      (2L, span("c") + " " + span("a"))        // quotes A after its own C
    ).toDF("doc_id", "text")
    val out = DedupOps.spanDedup(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_segs") === 2 && out(0).getAs[Long]("n_kept") === 2)
    assert(out(0).getAs[String]("clean_text") === span("a") + " " + span("b"))
    assert(out(1).getAs[Long]("n_segs") === 2 && out(1).getAs[Long]("n_kept") === 1)
    assert(out(1).getAs[String]("clean_text") === span("c"))
  }

  test("within-document duplicate spans keep only the first copy") {
    val docs = Seq((1L, span("x") + " " + span("x") + " " + span("y")))
      .toDF("doc_id", "text")
    val out = DedupOps.spanDedup(docs).collect().head
    assert(out.getAs[Long]("n_segs") === 3)
    assert(out.getAs[Long]("n_kept") === 2)
    assert(out.getAs[String]("clean_text") === span("x") + " " + span("y"))
  }

  test("a document made entirely of earlier spans reports n_kept=0 with empty text") {
    val docs = Seq(
      (1L, span("a")),
      (2L, span("a"))
    ).toDF("doc_id", "text")
    val out = DedupOps.spanDedup(docs).orderBy("doc_id").collect()
    assert(out(1).getAs[Long]("n_kept") === 0L)
    assert(out(1).getAs[String]("clean_text") === "")
  }

  test("unique documents pass through unchanged, including short tail segments") {
    // 25 tokens → segments of 10, 10, 5; nothing duplicated anywhere
    val text = (1 to 25).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = DedupOps.spanDedup(docs).collect().head
    assert(out.getAs[Long]("n_segs") === 3)
    assert(out.getAs[Long]("n_kept") === 3)
    assert(out.getAs[String]("clean_text") === text)
  }

  test("sf fixture: removal is conservative — survivors' spans are a subset and totals reconcile") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = DedupOps.spanDedup(docs)
    val bad = out.filter(col("n_kept") > col("n_segs")).count()
    assert(bad === 0L)
    // every doc is present exactly once in the output
    assert(out.count() === docs.count())
    // kept spans reassemble to a prefix-free subset: token count of
    // clean_text never exceeds the original
    val grew = out.join(docs, "doc_id")
      .filter(length(col("clean_text")) > length(col("text"))).count()
    assert(grew === 0L)
  }
}
