package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeKernel

/** Real BPE token counting (r10 verdict #4): merge-loop correctness against
  * hand-tokenized words, GPT-2 merges.txt parsing, operator-vs-kernel
  * parity on a planted corpus, and the measured divergence from q91's
  * pre-tokenizer proxy.
  */
class BpeSpec extends SparkSpec {

  private val rank = BpeKernel.parseMerges(TextOps.bpeMergesFixture)

  test("merges.txt parsing skips the #version header and keeps line order as rank") {
    assert(rank(("t", "h")) === 0)
    assert(rank(("th", "e")) === 1)
    assert(rank(("t", "a")) === 13)
    assert(rank.size === 14)
  }

  test("hand-tokenized words: the merge loop follows lowest-rank-leftmost exactly") {
    def p(w: String): Seq[String] = BpeKernel.pieces(w, rank)
    // "table": (a,b) r3 beats (t,a) r14 and (l,e) r4 → t ab l e; then
    // (l,e) → t ab le; then the composite (ab,le) r5 → t able
    assert(p("table") === Seq("t", "able"))
    // "the": (t,h) r1 → th e; composite (th,e) r2 → the
    assert(p("the") === Seq("the"))
    // "fast": (s,t) r11 beats (f,a) r12 → f a st; then (f,a) → fa st
    assert(p("fast") === Seq("fa", "st"))
    // "data": (d,a) r13 beats (t,a) r14 → da t a; then (t,a) → da ta
    assert(p("data") === Seq("da", "ta"))
    assert(p("scan") === Seq("sc", "an"))
    // untouched word: no pair in the table
    assert(p("xyz") === Seq("x", "y", "z"))
    assert(p("") === Seq.empty)
    // whole sentence, hand-computed: the(1) fast(2) data(2) scan(2) = 7
    assert("the fast data scan".split(" ").map(w => p(w).length).sum === 7)
  }

  test("leftmost-occurrence discipline on repeated pairs") {
    // "ththth" with only (t,h) applicable: merges left-to-right,
    // th th th → 3 pieces, never a (h,t) merge (not in the table)
    assert(BpeKernel.pieces("ththth", rank) === Seq("th", "th", "th"))
  }

  test("operator matches a driver-side kernel recompute and measures the q91 divergence") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe")
    val docs = Seq(
      (0L, "the fast data scan", "en", "s0", 18L),
      (1L, "table the table", "en", "s0", 15L),
      (2L, "", "en", "s1", 0L),
      (3L, "query customer order", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(tmp.resolve("documents.parquet").toString)
    val out = TextOps.queries("q96_bpe_real_tokens")(sp, tmp.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def toks(t: String): Long =
      t.split(" ").filter(_.nonEmpty).map(w => BpeKernel.pieces(w, rank).length.toLong).sum
    assert(out(0L) === ((4L, toks("the fast data scan"), 4L)))
    assert(out(0L)._2 === 7L)
    assert(out(1L) === ((3L, toks("table the table"), 3L)))
    assert(out(2L) === ((0L, 0L, 0L)), "empty doc must report zeros, not drop")
    // divergence measured: the real count exceeds the pre-tokenizer proxy
    // on this vocabulary (each word splits into >1 piece on average)
    assert(out(0L)._2 > out(0L)._3,
      "fixture merges must make real BPE diverge from the pre-tokenizer count")
  }

  test("expression participates in codegen (no interpreted fallback in the plan)") {
    val sp = spark
    import sp.implicits._
    graft.functions.BpeFunctions.register(sp)
    val merges = TextOps.bpeMergesFixture.replace("'", "''")
    // a parquet scan (not a local relation) so the projection actually
    // compiles — a LocalTableScan constant-folds the expression away
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_cg")
    Seq("table", "the").toDF("w").write.parquet(tmp.resolve("w.parquet").toString)
    val df = sp.read.parquet(tmp.resolve("w.parquet").toString)
      .select(col("w"), expr(s"graft_bpe_count(w, '$merges')").as("n"))
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("table" -> 2L, "the" -> 1L))
    // the starred span (`*(1) Project`) marks whole-stage codegen; a
    // CodegenFallback expression would leave the Project unstarred
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected a codegen'd Project span:\n$plan")
  }

  test("q104 trainer reproduces hand-computed merges on a planted corpus") {
    val sp = spark
    import sp.implicits._
    // corpus: "aaab" x3, "ab" x2. Iteration 1 pair counts:
    //   (a,a) 2*3=6, (a,b) 3+2=5 → merge 1 = (a,a) cnt 6
    // Iteration 2 (words now [aa,a,b]x3, [a,b]x2):
    //   (aa,a) 3, (a,b) 5 → merge 2 = (a,b) cnt 5
    // Iteration 3 (words [aa,ab]x3, [ab]x2):
    //   (aa,ab) 3 → merge 3 = (aa,ab) cnt 3
    val docs = Seq(
      (0L, "aaab aaab aaab"),
      (1L, "ab ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, 5)
    assert(merges === Seq(("a", "a", 6L), ("a", "b", 5L), ("aa", "ab", 3L)),
      s"got $merges")
    // nMerges=5 requested but pairs EXHAUST after 3 (every word one
    // symbol) — the trainer must stop, not loop or fail
    assert(merges.length === 3)
  }

  test("q104 learn->apply round trip: trained merges drive q96's applier") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "aaab aaab aaab"),
      (1L, "ab ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, 2)
    val text = TextOps.mergesAsText(merges)
    // after (a,a) and (a,b): "aaab" → [aa, ab] (2 pieces), "ab" → [ab] (1)
    val rank2 = BpeKernel.parseMerges(text)
    assert(BpeKernel.pieces("aaab", rank2) === Seq("aa", "ab"))
    assert(BpeKernel.pieces("ab", rank2) === Seq("ab"))
    val counted = TextOps.bpeRealTokens(docs, text)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counted === Map(0L -> 6L, 1L -> 2L)) // 3 words x 2, 2 words x 1
    // deterministic: a second training run yields the identical table
    assert(TextOps.bpeTrain(docs, 2) === merges)
  }

  test("graft_bpe_pieces returns the symbol sequence the count bills") {
    val sp = spark
    import sp.implicits._
    graft.functions.BpeFunctions.register(sp)
    val merges = TextOps.bpeMergesFixture.replace("'", "''")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_pc")
    Seq("table", "the", "x").toDF("w")
      .write.parquet(tmp.resolve("w.parquet").toString)
    val rows = sp.read.parquet(tmp.resolve("w.parquet").toString)
      .select(col("w"), expr(s"graft_bpe_pieces(w, '$merges')").as("ps"),
        expr(s"graft_bpe_count(w, '$merges')").as("n"))
      .collect()
    for (r <- rows) {
      val ps = r.getSeq[String](1)
      assert(ps === BpeKernel.pieces(r.getString(0), rank))
      assert(ps.length.toLong === r.getLong(2), "pieces and count must agree")
    }
  }

  test("q120 tokenizer-fit report: hand-computed fertility and bytes-per-token") {
    val sp = spark
    import sp.implicits._
    // s1: the(1) the(1) able(1) -> 3 words / 3 tokens / 12 bytes
    // s2: scan(2) + fast(2) data(2) -> 3 words / 6 tokens / 13 bytes
    val docs = Seq(
      ("s1", "the the able"), ("s2", "scan"), ("s2", "fast data")
    ).toDF("source", "text")
    val got = TextOps.tokenizerFitReport(docs, TextOps.bpeMergesFixture)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("s1") === ((1L, 3L, 3L, 12L, 1.0, 4.0)))
    // bytes_per_token s2 = (2*13e6+6) div 12 / 1e6 = 2166667/1e6 (half-up)
    assert(got("s2") === ((2L, 3L, 6L, 13L, 2.0, 2.166667)))
  }

  test("q121 ingest plan: hand-computed weights, token split, byte pricing") {
    val sp = spark
    import sp.implicits._
    // s1: 3 bpe tokens / 12 bytes -> weight isqrt(3)=1
    // s2: 6 bpe tokens / 13 bytes -> weight isqrt(6)=2; tot_w=3
    val docs = Seq(
      ("s1", "the the able"), ("s2", "scan"), ("s2", "fast data")
    ).toDF("source", "text")
    val got = TextOps.ingestPlan(docs, TextOps.bpeMergesFixture, budgetTokens = 9L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // planned: 9*1 div 3 = 3 and 9*2 div 3 = 6 (whole budget at tot_w | 9)
    // bytes: 3*12 div 3 = 12; 6*13 div 6 = 13 — each source at its OWN
    // bytes-per-token, not a corpus-average
    assert(got("s1") === ((3L, 12L, 1L, 3L, 12L, 1.0)))
    assert(got("s2") === ((6L, 13L, 2L, 6L, 13L, 1.0)))
  }

  test("q121 sf plan: one row per source, budget never oversubscribed") {
    val d = "/root/testdata/sf0.01"
    val rows = TextOps.queries("q121_ingest_plan")(spark, d).collect()
    val nSources = spark.read.parquet(s"$d/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length.toLong === nSources)
    // floor-div splits can under-fill but never overshoot the budget
    assert(rows.map(_.getAs[Long]("planned_tokens")).sum <= 1000000L)
    assert(rows.forall(_.getAs[Long]("planned_bytes") > 0L))
    assert(rows.forall(_.getAs[Double]("oversample") > 0.0))
  }

  test("q120 agrees with q96 aggregated by source on the sf corpus") {
    val d = "/root/testdata/sf0.01"
    val perDoc = TextOps.queries("q96_bpe_real_tokens")(spark, d)
      .join(spark.read.parquet(s"$d/documents.parquet").select("doc_id", "source"),
        "doc_id")
      .groupBy("source").agg(
        sum("n_words").as("w96"), sum("n_bpe_tokens").as("t96"))
    val report = TextOps.queries("q120_tokenizer_fit")(spark, d)
    val joined = report.join(perDoc, "source").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      assert(r.getAs[Long]("n_words") === r.getAs[Long]("w96"),
        s"word totals must agree for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_bpe_tokens") === r.getAs[Long]("t96"),
        s"token totals must agree for ${r.getAs[String]("source")}")
    }
  }
}
