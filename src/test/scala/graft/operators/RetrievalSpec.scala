package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q144 BM25 retrieval and q145 refined IVF-PQ search: BM25 against an
  * independent plain-Scala recompute; the refined search's exactness
  * guarantees (returned distances ARE the exact distances; wide-window
  * equals the exact scan's top-k; quantization error confined to window
  * membership).
  */
class RetrievalSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q144: BM25 top-5 matches an independent plain-Scala recompute") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = docs.filter(_._1 >= 10)
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.length }
    val n = corpus.size
    val avgdl = dl.values.sum.toDouble / n
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, xs) => w -> xs.length }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, xs) => w -> xs.size }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = docs.filter(_._1 < 10).map { case (qid, qtext) =>
      val qws = qtext.split(" ").distinct
      val scored = tf.toSeq.flatMap { case (did, m) =>
        val s = qws.collect {
          case w if m.contains(w) =>
            val idf = math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5))
            r6(idf * (m(w) * (1.2 + 1.0)) /
              (m(w) + 1.2 * (1.0 - 0.75 + 0.75 * dl(did) / avgdl)))
        }
        if (s.isEmpty) None else Some(did -> r6(s.sum))
      }
      qid -> scored.sortBy { case (did, sc) => (-sc, did) }.take(5)
    }
    val got = TextOps.queries("q144_bm25_topk")(spark, d).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3))
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    assert(got.keySet === expect.keySet)
    expect.foreach { case (q, want) =>
      assert(got(q) === want, s"qid $q: got ${got(q)}, want $want")
    }
  }

  test("q145: refined distances are exact; wide window equals the exact scan") {
    graft.functions.VectorFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_q145").toString
    SimilarityOps.saveIvfPqIndex(spark, d, dir)
    // exact brute-force rounded squared L2 per (qid, cid)
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val vecs = rows.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def exactDist(q: Long, c: Long): Double = {
      val (a, b) = (vecs(q), vecs(c))
      r6(a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i))))
    }
    // (a) every returned distance IS the exact distance — the refine's
    // precision claim: no approximate number leaves this operator
    val got = SimilarityOps.searchSavedIvfPqReranked(spark, d, dir).collect()
    got.foreach { r =>
      assert(r.getDouble(2) === exactDist(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)}): returned dist is not exact")
    }
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to 5L), s"qid $q ranks")
    }
    // (b) with the window at the pool bound and all cells probed,
    // refined top-k IS the exact scan's top-k — quantization error is
    // confined to window membership, nothing else
    val nVecs = rows.length
    val wide = SimilarityOps.searchSavedIvfPqReranked(spark, d, dir,
      nProbes = 10, k = 5, overFetch = nVecs).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }
    val exact = rows.map(_._1).filter(_ < 3).map { q =>
      q -> rows.map(_._1).filter(_ != q)
        .map(c => (exactDist(q, c), c)).sorted.take(5).map(_._2).toSeq
    }.toMap
    assert(wide === exact, "wide-window refined search diverged from exact")
    spark.catalog.clearCache()
  }
}
