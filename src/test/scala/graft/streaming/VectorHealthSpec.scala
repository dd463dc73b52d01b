package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.SimilarityOps

/** q140's verdict + the streaming vector-health gate: the planted-truth
  * table for every failure class, one-definition agreement between the
  * batch audit and the gate, and the streamed composition — a corrupt
  * vector must never become index state.
  */
class VectorHealthSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def healthy(id: Long): Array[Double] = {
    val raw = Array.tabulate(64)(j => ((id * 31 + j * 17) % 13).toDouble - 6.0)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  test("verdict truth table: every failure class, checked by name") {
    val sp = spark
    import sp.implicits._
    val rows = Seq[(Long, Array[Double])](
      (1L, healthy(1L)),
      (2L, Array.fill(64)(0.0)),                       // zero → norm_low
      (3L, healthy(3L).map(_ * 10.0)),                 // inflated → norm_high
      (4L, healthy(4L).take(32)),                      // truncated → wrong_dim
      (5L, healthy(5L).updated(0, Double.NaN)),        // NaN → nonfinite
      (6L, healthy(6L).updated(7, Double.PositiveInfinity)), // Inf → nonfinite
      (7L, null)                                       // null → null
    ).toDF("vec_id", "e")
      // a null COMPONENT (array itself non-null) — representable in
      // parquet array<double>, produced by upstream schema drift; the
      // Σx² fold yields NULL, which must classify nonfinite, not fall
      // through every NULL comparison to 'ok' (r14 review)
      .unionByName(Seq(8L).toDF("vec_id")
        .withColumn("e", org.apache.spark.sql.functions.expr(
          "transform(sequence(1, 64), i -> IF(i = 1, CAST(NULL AS DOUBLE), 0.125D))")))
    val got = rows
      .withColumn("verdict", SimilarityOps.vectorVerdictCol(
        org.apache.spark.sql.functions.col("e")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(1L -> "ok", 2L -> "norm_low", 3L -> "norm_high",
      4L -> "wrong_dim", 5L -> "nonfinite", 6L -> "nonfinite", 7L -> "null",
      8L -> "nonfinite"))
  }

  test("q140 audit counts equal an independent modulus recompute") {
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    val expect = (0L until n).groupBy { id =>
      if (id % 31 == 0) "wrong_dim"
      else if (id % 37 == 0) "nonfinite"
      else if (id % 23 == 0) "norm_low"
      else if (id % 29 == 0) "norm_high"
      else "ok"
    }.map { case (v, ids) => v -> ((ids.size.toLong, ids.min, ids.max)) }
    val got = SimilarityOps.queries("q140_vector_health")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
  }

  test("streamed gate: corrupt vectors never become index state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    graft.functions.VectorFunctions.register(sp)
    val base = (0L until 60L).map(i => VecRow(i, i % 10, healthy(i))).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft_vhealth").toString
    SimilarityOps.saveIvfPqIndexFrom(base, dir)

    val input = MemoryStream[VecRow]
    val gated = IndexMaintenance.vectorHealthGate(input.toDF())
    val q = IndexMaintenance.ivfPqAppendSink(gated, dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_vhealth_ckpt").toString)
      .start()
    try {
      input.addData(
        VecRow(60L, 0L, healthy(60L)),
        VecRow(61L, 1L, Array.fill(64)(0.0)),
        VecRow(62L, 2L, healthy(62L).updated(3, Double.NaN)),
        VecRow(63L, 3L, healthy(63L).take(32)),
        VecRow(64L, 4L, healthy(64L)))
      q.processAllAvailable()
    } finally q.stop()

    val indexed = sp.read.parquet(s"$dir/codes")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed.contains(60L) && indexed.contains(64L),
      "healthy arrivals must be appended")
    assert(Seq(61L, 62L, 63L).forall(!indexed.contains(_)),
      "corrupt arrivals leaked into the index")
    IndexMaintenance.releaseIvfPqLease(sp, dir)
  }
}
