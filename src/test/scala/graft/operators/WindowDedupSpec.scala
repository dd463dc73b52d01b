package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q71 exact substring-window dedup: planted-fixture semantics (cross-doc
  * vs within-doc sharing, short-doc gate), an independent driver-side
  * recompute over the real sf corpus, and the no-self-join plan shape.
  */
class WindowDedupSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def docsDf(rows: Seq[(Long, String)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  // windowDedup returns a persisted frame (caller-owns-cache contract)
  private def collectAndRelease(df: org.apache.spark.sql.DataFrame) = {
    val rows = df.collect()
    df.unpersist(blocking = true)
    rows
  }

  test("planted windows: cross-doc sharing flags, within-doc repetition does not") {
    val S = (1 to 20).map(i => s"s$i").mkString(" ") // the shared 20-token run
    val docs = docsDf(Seq(
      1L -> s"a1 a2 a3 a4 a5 $S",                   // shares S with doc 2
      2L -> s"$S b1 b2 b3 b4 b5",                   // shares S with doc 1
      3L -> (101 to 125).map(i => s"c$i").mkString(" "), // 25 unique tokens
      4L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10",       // short: no window at all
      5L -> s"$S $S"))                              // repeats S only within itself
    val out = collectAndRelease(DedupOps.windowDedup(docs))
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // docs 1 and 2 share exactly ONE 20-token window (S itself: doc 1's
    // only aligned run, doc 2's window at start 0)
    assert(out(1L) === ((1L, true)), s"doc 1: ${out(1L)}")
    assert(out(2L) === ((1L, true)), s"doc 2: ${out(2L)}")
    assert(out(3L) === ((0L, false)), "unique doc flagged")
    assert(out(4L) === ((0L, false)), "sub-window doc flagged")
    // doc 5 contains S at two offsets — a WITHIN-doc duplicate... but S is
    // also in docs 1/2, so it IS cross-doc shared. Its windows dedup to
    // distinct hashes first, so the count is the number of distinct shared
    // windows, not occurrences.
    assert(out(5L)._2, "doc 5 shares S with docs 1/2")
  }

  test("within-doc-only repetition never flags") {
    val S = (1 to 20).map(i => s"only$i").mkString(" ")
    val docs = docsDf(Seq(
      1L -> s"$S $S",                               // window repeated in one doc
      2L -> (1 to 30).map(i => s"z$i").mkString(" ")))
    val out = collectAndRelease(DedupOps.windowDedup(docs))
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> false, 2L -> false),
      "within-doc window repetition must not flag (dedup is cross-document)")
  }

  test("q71 on the sf corpus matches an independent driver-side recompute") {
    val w = 20
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // independent recompute: plain Scala sliding windows, no hashing
    val perDoc = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val wins: Set[String] =
        if (toks.length < w) Set.empty
        else toks.sliding(w).map(_.mkString(" ")).toSet
      id -> wins
    }
    val docCount = scala.collection.mutable.Map[String, Int]()
    perDoc.foreach { case (_, wins) =>
      wins.foreach(s => docCount(s) = docCount.getOrElse(s, 0) + 1)
    }
    val expected = perDoc.map { case (id, wins) =>
      val nd = wins.count(s => docCount(s) > 1).toLong
      id -> ((nd, nd > 0))
    }.toMap
    val got = collectAndRelease(DedupOps.queries("q71_window_dedup")(spark, d))
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === expected)
    // and the fixture is non-degenerate: some flagged, some not
    val flagged = expected.values.count(_._2)
    assert(flagged > 0 && flagged < expected.size,
      s"degenerate fixture: $flagged/${expected.size} flagged")
  }

  test("plan never self-joins the corpus: no cartesian or nested-loop join") {
    // the returned frame is persisted; InMemoryRelation's treeString still
    // prints the cached child plan, so the join structure stays auditable
    val df = DedupOps.queries("q71_window_dedup")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    df.unpersist(blocking = true)
    assert(plan.contains("HashAggregate"), s"unexpectedly opaque plan: $plan")
    assert(!plan.contains("CartesianProduct"), "cartesian in q71 plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in q71 plan")
  }
}
