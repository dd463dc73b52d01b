package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Similarity search over the `embeddings` table (Array[Float], unit-norm).
  *
  * Brute-force cosine top-k is the correctness baseline: a broadcast of the
  * (small) query set against the full candidate scan — a narrow map + top-k
  * per query, no shuffle of the candidate side. At 100 TB the scale path is
  * the LSH/IVF variant (q41): random-hyperplane bucket assignment turns the
  * all-pairs problem into per-bucket joins.
  *
  * Dot products use `aggregate(zip_with(...))` over DOUBLE — sequential
  * left-to-right fold, bit-identical to the oracle's list_dot_product.
  */
object SimilarityOps {

  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with(CAST($a AS ARRAY<DOUBLE>), CAST($b AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 neighbors for query vectors vec_id < 3.
    "q37_sim_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      import org.apache.spark.sql.expressions.Window
      val scored = c.join(broadcast(q), col("cid") =!= col("qid"))
        .withColumn("cos", round(
          expr(dotExpr("qe", "ce")) /
            (sqrt(expr(dotExpr("qe", "qe"))) * sqrt(expr(dotExpr("ce", "ce")))), 6))
      val w = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("cid"), col("cos"), col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    }),

    // Embedding near-duplicate pairs: cosine ≥ 0.45 across all pairs.
    "q39_embedding_neardup" -> ((s, d) => {
      val e = embeddings(s, d)
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      a.join(b, col("ia") < col("ib"))
        .withColumn("cos",
          expr(dotExpr("ea", "eb")) /
            (sqrt(expr(dotExpr("ea", "ea"))) * sqrt(expr(dotExpr("eb", "eb")))))
        .filter(col("cos") >= 0.45)
        .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
        .orderBy("ia", "ib")
    }),

    // Label-centroid assignment: an IVF-style coarse quantizer. Centroids are
    // per-label means (computed distributed, then broadcast); each vector is
    // assigned to its nearest centroid. Output: confusion of true label vs
    // assigned centroid.
    "q41_ivf_assign" -> ((s, d) => {
      val e = embeddings(s, d)
      val unpacked = e.select(col("vec_id"), col("label"),
        posexplode(expr("CAST(embedding AS ARRAY<DOUBLE>)")).as(Seq("pos", "x")))
      val centroids = unpacked.groupBy(col("label").as("c_label"), col("pos").as("c_pos"))
        .agg(avg("x").as("cx"))
      val scored = unpacked.join(broadcast(centroids), col("pos") === col("c_pos"))
        .groupBy("vec_id", "label", "c_label")
        .agg(sum(col("x") * col("cx")).as("dot"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("vec_id").orderBy(desc_nulls_last("r_dot"), col("c_label"))
      scored
        .withColumn("r_dot", round(col("dot"), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("label"), col("c_label").as("assigned"))
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "assigned")
    })
  )

  val oracle: Map[String, String] = Map(
    "q37_sim_topk" ->
      """SELECT qid, cid, cos, rn FROM (
           SELECT q.vec_id AS qid, c.vec_id AS cid,
             round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cos,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) DESC,
               c.vec_id) AS rn
           FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
           WHERE q.vec_id < 3) t
         WHERE rn <= 5 ORDER BY qid, rn""",

    "q39_embedding_neardup" ->
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
           round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45
         ORDER BY ia, ib""",

    "q41_ivf_assign" ->
      """WITH unpacked AS (
           SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
         centroids AS (
           SELECT label AS c_label, pos AS c_pos, avg(x) AS cx
           FROM unpacked GROUP BY label, pos),
         scored AS (
           SELECT vec_id, label, c_label, sum(x * cx) AS dot
           FROM unpacked JOIN centroids ON pos = c_pos
           GROUP BY vec_id, label, c_label),
         best AS (
           SELECT vec_id, label, c_label,
             row_number() OVER (PARTITION BY vec_id ORDER BY round(dot, 6) DESC NULLS LAST, c_label) AS rn
           FROM scored)
         SELECT label, c_label AS assigned, count(*) AS n
         FROM best WHERE rn = 1
         GROUP BY label, assigned ORDER BY label, assigned"""
  )
}
