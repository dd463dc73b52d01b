package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** q119 semantic decontamination: the embedding-space complement of the
  * n-gram decontamination family (q67/q74/q79/q115). A paraphrased eval
  * item shares no surface 5-gram with its source, so the gram scrubbers
  * cannot see it — but it sits next to the source in embedding space.
  * These specs pin the argmax/tie-break/threshold semantics on planted
  * 2-D vectors (where every cosine is hand-computable) and the report
  * shape + flag consistency on the sf embeddings.
  */
class SemanticDecontamSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("q119 planted: argmax probe, inclusive bar, smaller-eval-id tie-break") {
    VectorFunctions.register(spark)
    import spark.implicits._
    // probes (vec_id < 50): p0 = x-axis, p1 = y-axis
    // corpus: 100 parallels p0 (scaled — cosine ignores magnitude);
    // 101 ties both probes at cos ≈ 0.707107 (tie → smaller eval_id);
    // 102 is anti-parallel to p0, orthogonal to p1 (best cos 0.0 → clean);
    // 103 leans to p1 (cos 2/√5 ≈ 0.894427 → contaminated)
    val base = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (100L, Array(2.0, 0.0)), (101L, Array(1.0, 1.0)),
      (102L, Array(-1.0, 0.0)), (103L, Array(1.0, 2.0))
    ).toDF("vec_id", "e").withColumn("nrm", sqrt(expr("graft_dot(e, e)")))

    val got = SimilarityOps.semanticDecontam(base).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.keySet === Set(100L, 101L, 102L, 103L))
    assert(got(100L) === ((0L, 1.0, 1L)), "parallel duplicate must flag on probe 0")
    assert(got(101L) === ((0L, 0.707107, 1L)), "tie must break to the smaller eval_id")
    assert(got(102L) === ((1L, 0.0, 0L)), "orthogonal-at-best vector is clean")
    assert(got(103L) === ((1L, 0.894427, 1L)), "nearest probe wins, not the first")
  }

  test("q119 sf report shape: one row per corpus vector, flag == (cos >= bar)") {
    val out = SimilarityOps.queries("q119_semantic_decontam")(spark, d)
    out.persist()
    try {
      val nCorpus = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id") >= 50).count()
      assert(out.count() === nCorpus, "every corpus vector must be reported")
      assert(out.select("vec_id").distinct().count() === nCorpus, "one row per vector")
      assert(out.filter(col("eval_id") < 0 || col("eval_id") >= 50).count() === 0L,
        "eval_id must name a probe")
      assert(out.filter(
        (col("cos") >= 0.45) =!= (col("contaminated") === 1L)).count() === 0L,
        "contaminated flag must be exactly the inclusive 0.45 bar")
      // the reported cos is a true argmax: an independent max-agg over the
      // full corpus×probe cosine table must agree row-for-row
      VectorFunctions.register(spark)
      val base = spark.read.parquet(s"$d/embeddings.parquet")
        .withColumn("e", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
        .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
      val probes = base.filter(col("vec_id") < 50)
        .select(col("e").as("pe"), col("nrm").as("pn"))
      val best = base.filter(col("vec_id") >= 50)
        .join(broadcast(probes), lit(true))
        .groupBy("vec_id")
        .agg(max(round(expr("graft_dot(e, pe)") / (col("nrm") * col("pn")), 6)).as("mx"))
      val mismatched = out.join(best, "vec_id")
        .filter(col("cos") =!= col("mx")).count()
      assert(mismatched === 0L, "reported cos must equal the brute-force max")
    } finally out.unpersist()
  }
}
