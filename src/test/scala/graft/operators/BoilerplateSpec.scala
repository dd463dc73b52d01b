package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** q75 boilerplate fraction + q76 boilerplate mining: planted-fixture
  * semantics (shared vs unique vs sub-window docs, within-doc repetition),
  * independent driver-side recomputes over the real sf corpus, and the
  * no-self-join plan shape.
  */
class BoilerplateSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"
  private val w = 20

  private def docsDf(rows: Seq[(Long, String)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def collectAndRelease(df: DataFrame) = {
    val rows = df.collect()
    df.unpersist(blocking = true)
    rows
  }

  test("q75 planted: shared windows raise the fraction, unique and short docs score 0") {
    val S = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = docsDf(Seq(
      1L -> s"$S",                                       // 1 window, shared → frac 1.0
      2L -> s"$S x1 x2 x3 x4 x5",                        // 6 windows, 1 shared
      3L -> (101 to 130).map(i => s"u$i").mkString(" "), // 11 windows, none shared
      4L -> "short doc under twenty tokens",             // no window at all
      5L -> s"$S $S"))                                   // S repeated WITHIN one doc
    val out = collectAndRelease(DedupOps.boilerplateFrac(docs))
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((1L, 1L, 1.0)), s"doc 1: ${out(1L)}")
    assert(out(2L) === ((6L, 1L, 0.1667)), s"doc 2: ${out(2L)}")
    assert(out(3L) === ((11L, 0L, 0.0)), s"doc 3: ${out(3L)}")
    assert(out(4L) === ((0L, 0L, 0.0)), "sub-window doc must report zeros")
    // doc 5's repetition of S is within-doc, but S also lives in docs 1/2,
    // so its S-window IS cross-doc boilerplate; its stitched windows
    // (s2..s1 etc.) are unique to it
    // 40 tokens -> 21 window offsets, but offsets 0 and 20 are both S, so
    // 20 DISTINCT windows, exactly one of them (S) cross-doc shared
    assert(out(5L) === ((20L, 1L, 0.05)), s"doc 5: ${out(5L)}")
  }

  test("q75 on the sf corpus matches an independent driver-side recompute") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
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
      val nDup = wins.count(s => docCount(s) > 1).toLong
      val frac =
        if (wins.isEmpty) 0.0
        else BigDecimal(nDup.toDouble / wins.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((wins.size.toLong, nDup, frac))
    }.toMap
    val got = collectAndRelease(DedupOps.queries("q75_boilerplate_frac")(spark, d))
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    val dup = expected.values.count(_._2 > 0)
    assert(dup > 0 && dup < expected.size,
      s"degenerate fixture: $dup/${expected.size} docs with boilerplate")
  }

  test("q76 planted: widely shared windows surface with document counts") {
    val A = (1 to 20).map(i => s"a$i").mkString(" ") // in 3 docs
    val B = (1 to 20).map(i => s"b$i").mkString(" ") // in 2 docs
    val docs = docsDf(Seq(
      1L -> s"$A p1 p2",
      2L -> s"q1 $A",
      3L -> A,
      4L -> s"$B r1",
      5L -> B,
      6L -> (1 to 25).map(i => s"z$i").mkString(" "))) // unique windows only
    val mined = {
      // run the operator body against the planted frame via the same query
      // shape: group distinct windows by text, count docs, top-20
      import org.apache.spark.sql.functions._
      docs
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), explode(array_distinct(expr(
          s"""transform(sequence(0, size(t) - $w),
                i -> array_join(slice(t, i + 1, $w), ' '))"""))).as("win"))
        .groupBy("win").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .orderBy(col("n_docs").desc, col("win"))
        .limit(20)
        .collect().map(r => r.getString(0) -> r.getLong(1))
    }
    assert(mined.head === (A -> 3L), s"head: ${mined.head}")
    assert(mined.map(_._1).contains(B))
    assert(mined.toMap.apply(B) === 2L)
    assert(!mined.map(_._1).exists(_.startsWith("z1 ")), "unique windows leaked")
  }

  test("q76 on the sf corpus matches an independent driver-side recompute") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1))
    val docCount = scala.collection.mutable.Map[String, Int]()
    docs.foreach { text =>
      val toks = text.split(" ", -1)
      if (toks.length >= w)
        toks.sliding(w).map(_.mkString(" ")).toSet
          .foreach(s => docCount(s) = docCount.getOrElse(s, 0) + 1)
    }
    val expected = docCount.toSeq.filter(_._2 > 1)
      .sortBy { case (win, n) => (-n, win) }.take(20)
      .map { case (win, n) => win -> n.toLong }
    val got = DedupOps.queries("q76_top_windows")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture must contain cross-doc shared windows")
  }

  test("q75/q76 plans never self-join the corpus") {
    for (q <- Seq("q75_boilerplate_frac", "q76_top_windows")) {
      val df = DedupOps.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      df.unpersist(blocking = true)
      assert(!plan.contains("CartesianProduct"), s"cartesian in $q plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in $q plan")
    }
  }
}
