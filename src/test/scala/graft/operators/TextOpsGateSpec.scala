package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** q77 Gopher gates + q78 surprisal tertile split over crafted corpora —
  * each gate must trip on exactly the document built to trip it, and the
  * tertile cut must be the integer ntile (sizes within 1, head strictly
  * more fluent than tail).
  */
class TextOpsGateSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))

  private def docsDf(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      rows.map { case (i, t, s) => Row(i, t, s) }.asJava, docSchema)

  test("q77 gates: each rule trips on its crafted document") {
    val fluent = (("the quick brown fox and the lazy dog of " * 8).trim + " end")
    val short = "the and of tiny"
    val longWords = Seq.fill(60)("pneumonoultramicroscopic").mkString(" ")
    val numeric = Seq.fill(60)("12345").mkString(" ")
    val docs = docsDf(Seq(
      (1L, fluent, "a"), (2L, short, "a"), (3L, longWords, "a"), (4L, numeric, "a")))

    val out = TextOps.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def gates(id: Long) = {
      val r = out(id)
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    }
    assert(gates(1L) == (1L, 1L, 1L, 1L, 1L)) // fluent doc passes everything
    assert(gates(2L)._1 == 0L && gates(2L)._5 == 0L) // short: fails g_len → drop
    assert(gates(3L)._2 == 0L && gates(3L)._5 == 0L) // >10-char mean: fails g_wlen
    // numeric: no alpha chars, no stopwords
    assert(gates(4L)._3 == 0L && gates(4L)._4 == 0L && gates(4L)._5 == 0L)
  }

  test("q77 is shuffle-free (row-local gate)") {
    // plan statically: under AQE the executed plan is an
    // AdaptiveSparkPlanExec LEAF, so collecting ShuffleExchangeExec would
    // find nothing even if a shuffle regressed in — the pin would be
    // vacuous (same guard as BucketedJoinSpec)
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val docs = docsDf(Seq((1L, "the and of x", "a")))
      val plan = TextOps.gopherRules(docs).queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
      // the pin can fail: the same check on a genuinely shuffling plan
      // (a groupBy over the gated frame) must see the exchange
      val shuffling = TextOps.gopherRules(docs).groupBy("keep").count()
        .queryExecution.executedPlan
      assert(shuffling.collect { case e: ShuffleExchangeExec => e }.nonEmpty)
    } finally conf.set("spark.sql.adaptive.enabled", oldAqe)
  }

  test("q78 tertiles: integer ntile sizes per source, head more fluent than tail") {
    // two sources, 7 and 9 docs; token mixes graded from common to rare so
    // surprisal orders them deterministically
    val common = "the and of to in a"
    val docs = docsDf(
      (1 to 7).map(i => (i.toLong, (common + " ") * (8 - i) + s"rare$i x$i y$i", "src1")) ++
      (11 to 19).map(i => (i.toLong, (common + " ") * (20 - i) + s"odd$i z$i", "src2")))

    val out = TextOps.surprisalSplit(docs).collect()
    val bySrc = out.groupBy(_.getString(1))
    // n=7 → head 2 (3r<=7 → r<=2), tail 3 (3r>14 → r>=5), middle 2
    val c1 = bySrc("src1").groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(c1 == Map("head" -> 2, "middle" -> 2, "tail" -> 3))
    // n=9 → exact thirds
    val c2 = bySrc("src2").groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(c2 == Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // head bucket is strictly more fluent (lower surprisal) than tail
    for (src <- Seq("src1", "src2")) {
      val g = bySrc(src).groupBy(_.getString(3))
      val headMax = g("head").map(_.getDouble(2)).max
      val tailMin = g("tail").map(_.getDouble(2)).min
      assert(headMax <= tailMin, s"$src: head $headMax vs tail $tailMin")
    }
  }

  test("q78 approx cutoff path agrees with the exact split") {
    // 90 docs / 3 sources, graded common-to-rare token mixes so surprisal
    // is distinct per doc within a source
    val common = "the and of to in a"
    val docs = docsDf(for {
      s <- Seq("sa", "sb", "sc")
      i <- 1 to 30
    } yield ((s.hashCode.abs % 97) * 100L + i,
      (common + " ") * (31 - i) + s"rare-$s-$i tail$i", s))

    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> r.getString(3)
    val exact = TextOps.surprisalSplit(docs).collect().map(key).toMap
    val approxDf = TextOps.surprisalSplitApprox(docs)
    try {
      val rows = approxDf.collect()
      val approx = rows.map(key).toMap
      assert(approx.keySet == exact.keySet)
      val agree = exact.count { case (id, b) => approx(id) == b }
      // only percentile-interpolation boundary docs may differ
      assert(agree >= (exact.size * 0.9).toInt, s"agreement $agree/${exact.size}")
      // every source still gets all three buckets
      rows.groupBy(_.getString(1)).values
        .foreach(g => assert(g.map(_.getString(3)).toSet == Set("head", "middle", "tail")))
    } finally approxDf.unpersist()
  }
}
