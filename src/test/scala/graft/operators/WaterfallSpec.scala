package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q113 end-to-end curation waterfall on a planted corpus: every stage
  * fires where planted, the waterfall order holds (gates before dedup
  * before decontam before quality), and the drop accounting sums to the
  * corpus. Eval set = doc_id < 10, corpus = the rest (the q67 convention).
  */
class WaterfallSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  // a gate-passing base: 50 tokens, 2 stopwords, all-alpha, mean word
  // length 283/50 = 5.66 ∈ both the g_wlen [3,10] and quality [2.5,8]
  // windows → score = min(1, 50/200) · 1 = 0.25, exactly at the keep bar
  private def passing(prefix: String): String =
    (Seq("the", "of") ++ (0 until 48).map(i => s"$prefix$i")).mkString(" ")

  test("q113: every stage fires where planted; waterfall order and accounting hold") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val dup = passing("dup")
    // 48 nine-char words: ratio 437/50 = 8.74 > 8 → quality factor 0.5 →
    // score 0.125 < 0.25, while g_wlen (437 ∈ [150, 500]) still passes
    val lowQ = (Seq("the", "of") ++ (0 until 48).map(i => f"wrd${i}%06d")).mkString(" ")
    val contam = passing("ok") + " e1 e2 e3 e4 e5"
    val docs = spark.createDataFrame(Seq(
      Row(5L, "e1 e2 e3 e4 e5 e6"),      // eval set: provides the grams
      Row(10L, contam),                   // shares a 5-gram with eval → decontam
      Row(11L, dup),                      // fingerprint keeper → kept
      Row(12L, dup),                      // same fingerprint, higher id → dedup
      Row(13L, "short text the of"),      // fails the 50-token gate → gates
      Row(14L, lowQ),                     // passes gates, fails quality → quality
      Row(15L, passing("fine"))).asJava,  // clean → kept
      schema)

    val out = TextOps.pipelineWaterfall(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // eval docs never appear; one row per corpus doc
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L))
    assert(out(10L) == (("decontam", 0L)))
    assert(out(11L) == (("kept", 1L)))
    assert(out(12L) == (("dedup", 0L)))
    assert(out(13L) == (("gates", 0L)))
    assert(out(14L) == (("quality", 0L)))
    assert(out(15L) == (("kept", 1L)))
  }
}
