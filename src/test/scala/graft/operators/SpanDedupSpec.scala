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

  // ---- q115 surgical decontamination ----

  test("q115: the matched 5-gram span is cut mid-document; overlaps union; short docs pass") {
    val docs = Seq(
      (1L, "e1 e2 e3 e4 e5 e6 e7"),                      // eval doc (doc_id < 10)
      (10L, "p1 p2 e1 e2 e3 e4 e5 p3 p4"),               // one gram hit at start 3
      // grams (e1..e5) at 1 and (e3..e7) at 3 overlap: union removes
      // tokens 1..7, NOT 10 — the overlap-union rule
      (11L, "e1 e2 e3 e4 e5 e6 e7 q1 q2 q3"),
      (12L, "tiny doc"),                                  // <5 tokens: verbatim
      (13L, "z1 z2 z3 z4 z5 z6"))                         // no overlap: verbatim
      .toDF("doc_id", "text")
    val out = DedupOps.decontamScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    // doc 10: tokens 3..7 removed (the matched gram), prose kept
    assert(out(10L) == ((9L, 4L, "p1 p2 p3 p4")))
    // doc 11: two overlapping matched grams remove 7 tokens, not 10
    assert(out(11L) == ((10L, 3L, "q1 q2 q3")))
    assert(out(12L) == ((2L, 2L, "tiny doc")))
    assert(out(13L) == ((6L, 6L, "z1 z2 z3 z4 z5 z6")))
  }

  test("q115: a fully-contaminated document survives as an empty row") {
    val docs = Seq(
      (1L, "e1 e2 e3 e4 e5"),
      (10L, "e1 e2 e3 e4 e5")).toDF("doc_id", "text")
    val out = DedupOps.decontamScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(10L) == ((5L, 0L, "")))
  }

  // ---- q116 span-level quality pruning ----

  test("q116: the high-surprisal run is pruned with its straddling windows; uniform docs pass") {
    // background: 10 docs of 45 × "c" → su("c") ≈ 0.0145 bits; the rare
    // run r1..r5 (freq 1 each, su ≈ 8.97 bits) sits at positions 21–25 of
    // doc 100. Every window touching a rare token clears the 1.5×-doc-mean
    // bar (≈902M vs 682M in µbit·count units), all-common windows do not,
    // so marked starts are exactly 17..25 → removal union [17, 29].
    val common = Seq.fill(45)("c").mkString(" ")
    val mixed = (Seq.fill(20)("c") ++ (1 to 5).map(i => s"r$i") ++
      Seq.fill(25)("c")).mkString(" ")
    val docs = ((0L until 10L).map(i => (i, common)) :+ (100L, mixed) :+
      (101L, "x y")).toDF("doc_id", "text")
    val out = TextOps.spanQualityPrune(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // uniform background docs: no window beats 1.5× their own mean
    (0L until 10L).foreach { i => assert(out(i) == ((45L, 45L, common))) }
    // the mixed doc loses tokens 17..29 (rare run + straddles), keeps 37 c's
    assert(out(100L) == ((50L, 37L, Seq.fill(37)("c").mkString(" "))))
    // short docs have no full window → verbatim
    assert(out(101L) == ((2L, 2L, "x y")))
  }

  // ---- q118 intra-document repetition scrub ----

  test("q118: later non-overlapping repeats are removed, overlaps of the first copy survive") {
    val sp = spark
    import sp.implicits._
    // doc 1: "a b c d e" at positions 1–5 repeats at 9–13 and 14–18 →
    //   marked starts {9, 14} (both ≥ 1+5), removal union [9, 18];
    //   the filler x1..x3 and the first copy stay → 8 tokens kept.
    // doc 2: "a a a a a a a" (7 a's): gram starts 1..3 share first_i=1;
    //   only starts ≥ 6 would mark, none exist → verbatim (overlapping
    //   self-repeats never eat their own first copy).
    // doc 3: no repeats → verbatim. doc 4: 4 tokens, no gram → verbatim.
    val d1 = "a b c d e x1 x2 x3 a b c d e a b c d e"
    val d2 = Seq.fill(7)("a").mkString(" ")
    val docs = Seq(
      1L -> d1, 2L -> d2, 3L -> "p q r s t u", 4L -> "k l m n")
      .toDF("doc_id", "text")
    val out = DedupOps.repetitionScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((18L, 8L, "a b c d e x1 x2 x3")))
    assert(out(2L) === ((7L, 7L, d2)))
    assert(out(3L) === ((6L, 6L, "p q r s t u")))
    assert(out(4L) === ((4L, 4L, "k l m n")))
  }

  test("q118: a 10-token run of one token loses exactly its second half") {
    val sp = spark
    import sp.implicits._
    // 10 a's: gram starts 1..6, first_i=1, marked = {6} → removes [6, 10]
    val docs = Seq(1L -> Seq.fill(10)("a").mkString(" ")).toDF("doc_id", "text")
    val out = DedupOps.repetitionScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((10L, 5L, Seq.fill(5)("a").mkString(" "))))
  }
}
