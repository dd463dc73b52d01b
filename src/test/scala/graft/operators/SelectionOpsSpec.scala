package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for the data-selection scorers: q81 hashed-feature linear
  * quality score and q82 DSIR importance weights.
  */
class SelectionOpsSpec extends SparkSpec {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q81: per-occurrence accumulation — repeating a document's tokens k× scales the score k×") {
    val out = graft.SparkEntry.queries("q81_hash_quality")(
      spark, d) // fixture run just to exercise the path
    assert(out.count() > 0)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma alpha beta gamma")
    ).toDF("doc_id", "text").createOrReplaceTempView("q81docs")
    val scores = spark.sql(
      """SELECT doc_id, aggregate(split(text, ' '), 0L,
           (acc, x) -> acc + (cast(conv(substring(md5(x), 1, 4), 16, 10) as bigint)
                              * 2654435761L) % 1999 - 999) AS s
         FROM q81docs""").orderBy("doc_id").collect()
    assert(scores(1).getLong(1) === 2 * scores(0).getLong(1))
  }

  test("q81: keep bit is exactly score_raw > 0 on the fixture") {
    val out = graft.SparkEntry.queries("q81_hash_quality")(spark, d)
    val bad = out.filter(
      (col("score_raw") > 0 && col("keep") =!= 1) ||
        (col("score_raw") <= 0 && col("keep") =!= 0)).count()
    assert(bad === 0L)
  }

  test("q82: documents sharing the target source's signature token outweigh those that don't") {
    // target source's docs are dominated by 'tgtword'; others by fillers.
    // A mixed doc in another source containing tgtword must score above a
    // same-source doc with none.
    val docs = Seq(
      (1L, "src0", Seq.fill(20)("tgtword").mkString(" ")),
      (2L, "src0", Seq.fill(20)("tgtword").mkString(" ")),
      (3L, "srcX", ("tgtword " * 10 + "filler " * 10).trim),
      (4L, "srcX", Seq.fill(20)("filler").mkString(" ")),
      (5L, "srcY", Seq.fill(20)("other").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val w = TextOps.dsirWeights(docs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lr_microbits")).toMap
    assert(w(3) > w(4), s"mixed doc ${w(3)} should outweigh filler doc ${w(4)}")
    assert(w(1) > w(3), s"pure target doc ${w(1)} should outweigh mixed doc ${w(3)}")
    // smoothing: tokens absent from the target corpus still yield finite
    // (non-null) weights
    assert(w.values.forall(_ != null))
  }

  test("q82: keep bit marks target-leaning documents on the fixture, and src0 leans target") {
    val out = TextOps.dsirWeights(graft.util.Tables.documents(spark, d))
    val bad = out.filter(
      (col("lr_microbits") > 0 && col("keep") =!= 1) ||
        (col("lr_microbits") <= 0 && col("keep") =!= 0)).count()
    assert(bad === 0L)
    // the target source itself must have the highest mean weight — the
    // estimator recovers the domain it was fit on
    val means = out.groupBy("source").agg(avg("lr_microbits").as("m"))
      .orderBy(desc("m")).collect()
    assert(means.head.getAs[String]("source") === "src0",
      s"src0 should rank first, got ${means.head}")
  }

  test("q82: n_tokens reconciles with a direct token count") {
    val docs = graft.util.Tables.documents(spark, d)
    val direct = docs.select(sum(size(split(col("text"), " ")))).as[Long].head
    val viaOp = TextOps.dsirWeights(docs).select(sum("n_tokens")).as[Long].head
    assert(direct === viaOp)
  }
}
