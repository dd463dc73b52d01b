package graft.operators

import graft.SparkSpec

/** q142 retrieval quality: the sort-free rank algebra (argmax best
  * positive + count-above) must reproduce a full independent ranking
  * recompute exactly, and the window plan for precision@10 must keep the
  * map-side group top-k.
  */
class RetrievalQualitySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("q142 rows equal an independent full-ranking recompute") {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val norms = rows.map { case (id, _, e) =>
      id -> math.sqrt(e.map(x => x * x).sum)
    }.toMap
    val vecs = rows.map(r => r._1 -> r._3).toMap
    val labs = rows.map(r => r._1 -> r._2).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (0L until 50L).map { q =>
      val order = vecs.keys.filter(_ != q).toSeq
        .map { c =>
          val (qe, ce) = (vecs(q), vecs(c))
          val cos = r6(qe.indices.map(i => qe(i) * ce(i)).sum /
            (norms(q) * norms(c)))
          (c, cos)
        }
        .sortBy { case (c, cos) => (-cos, c) }
      val firstHit = order.indexWhere { case (c, _) => labs(c) == labs(q) } + 1
      val hits10 = order.take(10).count { case (c, _) => labs(c) == labs(q) }
      q -> ((labs(q), firstHit.toLong,
        BigDecimal(1e6 / firstHit).setScale(0,
          BigDecimal.RoundingMode.HALF_UP).toLong, hits10.toLong))
    }.toMap
    val got = SimilarityOps.queries("q142_retrieval_quality")(spark, d)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }

  test("q142 plans a WindowGroupLimit for the top-10 and no corpus-wide rank window elsewhere") {
    val df = SimilarityOps.queries("q142_retrieval_quality")(spark, d)
    val ex = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(ex.contains("WindowGroupLimit"),
      "precision@10's rank filter planted no WindowGroupLimit")
    // exactly ONE window operator: the first-hit rank must come from the
    // agg algebra, not a second (unlimited, corpus-per-query) sort window
    val nWindows = "\\bWindow\\b".r.findAllIn(ex).length
    assert(nWindows <= 2,
      s"expected only the top-10 window (+group limit), found $nWindows Window nodes")
  }
}
