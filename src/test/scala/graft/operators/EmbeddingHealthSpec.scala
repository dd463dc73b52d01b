package graft.operators

import graft.SparkSpec

/** q139 embedding health: the corpus row recomputed independently with the
  * same micro-integer device in plain Scala, structural bounds on every
  * statistic, and the pooled-moments identity between the corpus row and
  * the label rows.
  */
class EmbeddingHealthSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  /** Half-AWAY-FROM-ZERO integer rounding — Spark/DuckDB `round(x, 0)`
    * semantics; `Math.round` rounds half toward +∞ and would disagree on
    * negative exact halves.
    */
  private def rint(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def vecs(): Array[(Long, Array[Long])] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val lab = r.getInt(1).toLong
        val e = r.getSeq[Float](2).map(x => rint(x.toDouble * 1e6)).toArray
        lab -> e
      }

  test("q139 corpus row matches an independent micro-integer recompute") {
    val vs = vecs()
    val n = vs.length.toLong
    val dim = vs.head._2.length
    val norms = vs.map { case (_, e) =>
      rint(math.sqrt(e.map(x => x * x).sum.toDouble))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val meanNorm = r6(norms.sum.toDouble / n / 1e6)
    val varU = (0 until dim).map { p =>
      val sx = vs.map(_._2(p)).sum
      val sxx = vs.map(v => v._2(p) * v._2(p)).sum
      rint((sxx.toDouble - sx.toDouble * sx.toDouble / n) / n / 1e6)
    }
    val mnU = (0 until dim).map { p =>
      rint(vs.map(_._2(p)).sum.toDouble / n)
    }
    val pr = r6(varU.sum.toDouble * varU.sum / varU.map(v => v * v).sum)
    val mvnD = math.sqrt(mnU.map(v => v * v).sum.toDouble) / 1e6
    val row = SimilarityOps.queries("q139_embedding_health")(spark, d)
      .filter("label = -1").collect()(0)
    assert(row.getLong(1) === n)
    assert(row.getDouble(2) === meanNorm, "mean_norm")
    assert(row.getDouble(3) === r6(norms.min.toDouble / 1e6), "min_norm")
    assert(row.getDouble(4) === r6(norms.max.toDouble / 1e6), "max_norm")
    assert(row.getDouble(5) === r6(mvnD), "mean_vec_norm")
    assert(row.getDouble(6) === r6(mvnD / (norms.sum.toDouble / n / 1e6)),
      "anisotropy")
    assert(row.getDouble(7) === pr, "participation_ratio")
  }

  test("q139 structural bounds and pooled-moment identities") {
    val out = SimilarityOps.queries("q139_embedding_health")(spark, d).collect()
    assert(out.length === 11, "10 label rows + the corpus row")
    val all = out.filter(_.getLong(0) == -1L)(0)
    val labs = out.filter(_.getLong(0) >= 0L)
    assert(labs.map(_.getLong(1)).sum === all.getLong(1),
      "label counts must sum to the corpus count")
    out.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4),
        s"norm ordering broken at label ${r.getLong(0)}")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0 + 1e-9,
        s"anisotropy out of (0,1] at label ${r.getLong(0)}: ${r.getDouble(6)}")
      assert(r.getDouble(7) >= 1.0 && r.getDouble(7) <= 64.0,
        s"participation ratio out of [1,dim] at label ${r.getLong(0)}")
    }
    // the corpus centroid norm can never exceed every label centroid norm
    // unless labels agree perfectly; on this data it must sit at or below
    // the max label row (mixture centroids contract)
    assert(all.getDouble(5) <= labs.map(_.getDouble(5)).max + 1e-9,
      "corpus centroid norm above every label centroid norm")
  }
}
