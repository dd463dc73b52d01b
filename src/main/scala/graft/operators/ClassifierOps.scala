package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine quality-classifier TRAINING over hashed bag-of-words features
  * (r10 verdict #5 — q81's missing half).
  *
  * q81 serves a linear scorer over 16-bit md5 feature buckets with a
  * stand-in weight function; this module trains real weights by logistic
  * regression: per epoch, ONE combiner-friendly aggregation computes the
  * per-doc scores under broadcast weights, a second computes the per-bucket
  * gradient, and the driver applies the update to the (≤65,536-entry —
  * bounded by the 16-bit bucket space, never corpus-sized) weight table.
  * This is the q72 Lloyd pattern applied to a classifier: model state
  * broadcasts down, sufficient statistics aggregate up, nothing
  * corpus-sized ever sits on the driver.
  *
  * Training labels for the q97 query are the q77 Gopher keep gate —
  * distilling rule gates into a classifier is the standard pipeline move
  * (fasttext-style quality classifiers are trained on rule-gated or
  * reference-corpus labels), and it makes the label derivable by the
  * DuckDB oracle from the shared gate fragments.
  *
  * Oracle pin (determinism): from the ZERO weight init, epoch 1 is
  * closed-form — σ(0) = ½ exactly, so the gradient for bucket j is
  * Σ_d (½ − y_d)·c_dj, and with learning rate 2 the post-epoch-1 weight is
  * the INTEGER w1[j] = (occurrences of j in keep docs) − (occurrences in
  * drop docs). q97 reports per-doc scores under w1 — every value integer,
  * engine-exact. Later epochs involve real sigmoids (floats), which is why
  * the oracle pins epoch 1 and the SPEC (not the oracle) pins multi-epoch
  * separation on a planted corpus.
  */
object ClassifierOps {

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** q81's feature hashing as a table: (doc_id, bucket, c) with bucket =
    * first 16 md5 bits of the token — ONE corpus explode + combiner
    * groupBy, the shared front half of training and serving.
    */
  def hashedFeatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(t), 1, 4), 16, 10) as bigint)").as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))

  /** q97's operator body: epoch-1 weights from zero init (the integer
    * closed form above) and each document's score under them. Scale shape:
    * the feature table persists once; weights are a ≤65,536-row aggregate
    * broadcast back; two linear shuffles total.
    */
  def trainQualityEpoch1(docs: DataFrame): DataFrame = {
    val labeled = docs.select(col("doc_id"),
      when(TextOps.gopherKeepCol(col("text")), 1L).otherwise(0L).as("y"))
    val feats = hashedFeatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w1 = feats.join(labeled, "doc_id")
      .groupBy("bucket")
      .agg(sum((col("y") * 2 - 1) * col("c")).as("w1"))
    val scores = feats.join(broadcast(w1), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("w1")).as("score1"))
    val res = labeled
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("score1"), lit(0L)).as("score1"))
      .withColumn("pred_keep", (col("score1") > 0).cast("long"))
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    feats.unpersist(blocking = false)
    out
  }

  /** Full logistic-regression training: `epochs` passes of batch gradient
    * descent with the given learning rate over (doc_id, bucket, c) features
    * and (doc_id, y∈{0,1}) labels. Returns the (bucket, w) weight table.
    *
    * Per epoch: scores under the current weights (broadcast ≤65,536-row
    * join + per-doc combiner agg), logistic residual σ(s)−y, per-bucket
    * gradient agg, driver-side update. The per-epoch collect is the
    * BOUNDED weight table (16-bit bucket space), the same documented
    * adaptive-local-state class as GraphOps' ≤1.6 MB component table —
    * never corpus-sized.
    */
  def trainLogistic(
      feats: DataFrame,
      labels: DataFrame,
      epochs: Int,
      lr: Double): DataFrame = {
    val sp = feats.sparkSession
    import sp.implicits._
    val fj = feats.join(labels, "doc_id")
      .select(col("doc_id"), col("bucket"), col("c").cast("double").as("c"),
        col("y").cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fj.count()
    var w: Map[Long, Double] = Map.empty
    for (_ <- 0 until epochs) {
      val wdf = broadcast(
        if (w.isEmpty) fj.select("bucket").distinct().withColumn("w", lit(0.0))
        else w.toSeq.toDF("bucket", "w"))
      val resid = fj.join(wdf, "bucket")
        .groupBy("doc_id", "y")
        .agg(sum(col("c") * col("w")).as("s"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("resid"))
      val grad = fj.join(resid, "doc_id")
        .groupBy("bucket")
        .agg(sum(col("resid") * col("c")).as("g"))
        .collect() // bounded: ≤65,536 buckets
      val gm = grad.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = gm.keysIterator.foldLeft(w) { (acc, b) =>
        acc.updated(b, acc.getOrElse(b, 0.0) - lr * gm(b))
      }
    }
    fj.unpersist(blocking = false)
    val out = w.toSeq.toDF("bucket", "w")
    out
  }

  /** q81's serving plumbing with a TRAINED weight table instead of the
    * stand-in hash weights: hashed features × broadcast weights → per-doc
    * linear score and the keep decision.
    */
  def scoreWithWeights(docs: DataFrame, weights: DataFrame): DataFrame =
    hashedFeatures(docs)
      .join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("w")).as("score"))
      .join(docs.select("doc_id"), Seq("doc_id"), "right")
      .select(col("doc_id"), coalesce(col("score"), lit(0.0)).as("score"))
      .withColumn("keep", (col("score") > 0).cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Classifier training, epoch 1 (see object scaladoc): Gopher-gate
    // labels, hashed features, zero-init logistic gradient in closed
    // integer form; per-doc scores under the epoch-1 weights.
    "q97_train_quality" -> ((s, d) => trainQualityEpoch1(documents(s, d))))

  val oracle: Map[String, String] = Map(
    "q97_train_quality" ->
      s"""WITH y AS (
           SELECT doc_id,
             CASE WHEN ${TextOps.oracleGateLenSql}
                   AND ${TextOps.oracleGateWlenSql}
                   AND ${TextOps.oracleGateAlphaSql}
                   AND ${TextOps.oracleGateStopSql}
                  THEN 1 ELSE 0 END :: BIGINT AS y
           FROM (${TextOps.oracleDocStatsSql("doc_id")}) b),
         feats AS (
           SELECT doc_id,
                  CAST('0x' || substr(md5(t), 1, 4) AS BIGINT) AS bucket,
                  count(*) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents) tok
           WHERE t <> ''
           GROUP BY doc_id, bucket),
         w1 AS (
           SELECT f.bucket, CAST(sum((y.y * 2 - 1) * f.c) AS BIGINT) AS w1
           FROM feats f JOIN y USING (doc_id)
           GROUP BY f.bucket),
         scores AS (
           SELECT f.doc_id, CAST(sum(f.c * w.w1) AS BIGINT) AS score1
           FROM feats f JOIN w1 w USING (bucket)
           GROUP BY f.doc_id)
         SELECT y.doc_id, y.y,
                CAST(coalesce(s.score1, 0) AS BIGINT) AS score1,
                CASE WHEN coalesce(s.score1, 0) > 0 THEN 1 ELSE 0 END :: BIGINT
                  AS pred_keep
         FROM y LEFT JOIN scores s USING (doc_id)""")
}
