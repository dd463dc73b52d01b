package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q146 longest-verbatim-overlap spans: the gaps-and-islands diagonal
  * device on constructed corpora where every span is known by hand.
  */
class OverlapSpanSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a planted verbatim inclusion reports one span of the planted length") {
    // eval doc 0 is 30 tokens; corpus doc 20 embeds tokens 6..25 (20 toks)
    // at position 11 inside otherwise-unique prose
    val ev = (1 to 30).map(i => s"e$i").mkString(" ")
    val inc = (6 to 25).map(i => s"e$i").mkString(" ")
    val corpus = ((1 to 10).map(i => s"c$i") ++ Seq(inc) ++ (1 to 10).map(i => s"d$i")).mkString(" ")
    val out = DedupOps.overlapSpans(docs(0L -> ev, 20L -> corpus)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 20L && r.getLong(1) === 0L)
    assert(r.getLong(2) === 11L, "corpus start = first embedded gram position")
    assert(r.getLong(3) === 6L, "eval start = position inside the eval doc")
    assert(r.getLong(4) === 20L, "span length = embedded token count")
  }

  test("two separated inclusions from the same eval doc are two islands") {
    val ev = (1 to 40).map(i => s"e$i").mkString(" ")
    val a = (1 to 8).map(i => s"e$i").mkString(" ")     // 8 tokens
    val b = (30 to 40).map(i => s"e$i").mkString(" ")   // 11 tokens
    val corpus = (Seq(a) ++ (1 to 9).map(i => s"x$i") ++ Seq(b)).mkString(" ")
    val out = DedupOps.overlapSpans(docs(0L -> ev, 20L -> corpus))
      .orderBy("start_pos").collect()
    assert(out.map(_.getLong(4)).toSeq === Seq(8L, 11L))
  }

  test("a sub-5-token shared phrase produces no span; 5 tokens produces span 5") {
    val ev = "a b c d e unique1 unique2 unique3 unique4 unique5"
    val four = "a b c d x1 x2 x3 x4 x5 x6"
    val five = "y1 y2 a b c d e y3 y4 y5"
    val out = DedupOps.overlapSpans(docs(0L -> ev, 20L -> four, 21L -> five)).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(4))).toSeq === Seq((21L, 5L)))
  }

  test("a gram repeated inside the eval doc yields island per diagonal, not a merge") {
    // eval: the 5-gram "r r r r r" occurs at positions 1 and 2 (overlapping);
    // corpus contains it once — two diagonals, each a 1-gram island of span 5,
    // on the SAME corpus start
    val ev = "r r r r r r"
    val corpus = "z1 z2 r r r r r z3"
    val out = DedupOps.overlapSpans(docs(0L -> ev, 20L -> corpus)).collect()
    // corpus positions 3..4 hold grams; eval has grams at j=1,2 → diagonals
    // pair them; every island is ≥ 5 tokens by construction
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(4) >= 5L))
  }

  test("sf0.001 fixture matches the oracle shape: ordered, unique keys") {
    val out = DedupOps.queries("q146_overlap_spans")(spark, "/root/testdata/sf0.001")
      .collect()
    val keys = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(keys.distinct.length === keys.length, "output key must be unique")
    val spans = out.map(_.getLong(4))
    assert(spans.sameElements(spans.sortBy(-_)) || spans.isEmpty)
  }
}
