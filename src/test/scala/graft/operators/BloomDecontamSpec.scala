package graft.operators

import graft.SparkSpec
import graft.functions.BloomFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q74 Bloom-prefiltered decontamination: bit-identity with q67 on the
  * real corpus, the no-false-negative contract of the probe expression,
  * and the plan shape (the bloom filter sits UNDER the verify join on the
  * corpus side).
  */
class BloomDecontamSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def collectAndRelease(df: DataFrame) = {
    val rows = df.collect()
    df.unpersist(blocking = true)
    rows
  }

  test("q74 equals q67 on the sf corpus (fp survivors all die in verify)") {
    val q67 = DedupOps.queries("q67_decontam_flags")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q74 = collectAndRelease(DedupOps.queries("q74_bloom_decontam")(spark, d))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q74 === q67, "bloom-prefiltered result must be exact")
    assert(q74.nonEmpty, "fixture must actually exercise the overlap path")
  }

  test("q79 fraction and flag are exact on crafted overlap levels") {
    val sp = spark
    import sp.implicits._
    // eval doc 1 contributes grams from "e1..e9" (5 distinct 5-grams);
    // corpus docs overlap it by construction:
    //   doc 10: fully inside eval text → frac 1.0, flagged
    //   doc 11: first 5 tokens shared ("e1..e5" = 1 eval gram), then 8
    //           unique tokens → 9 grams total, 1 hit → 1/9, not flagged
    //   doc 12: no overlap → 0 hits, 0.0, not flagged
    val evalText = (1 to 9).map(i => s"e$i").mkString(" ")
    val docs = Seq(
      (1L, evalText),
      (10L, evalText),
      (11L, (1 to 5).map(i => s"e$i").mkString(" ") + " " +
        (1 to 8).map(i => s"u$i").mkString(" ")),
      (12L, (1 to 10).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")

    // the SAME operator body the query entry calls
    val rep = DedupOps.decontamFraction(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

    assert(rep(10L) == ((5L, 5L, 1.0, true)))
    assert(rep(11L) == ((9L, 1L, 0.1111, false))) // 1/9 half-up at 4 dp
    assert(rep(12L) == ((6L, 0L, 0.0, false)))
  }

  test("probe has no false negatives on every eval gram") {
    val sp = spark
    import sp.implicits._
    BloomFunctions.register(spark)
    val grams = (1 to 500).map(i => s"gram-$i")
    val df = grams.toDF("g")
    val bloom = df.stat.bloomFilter("g", grams.size.toLong, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val misses = df.where(
      !call_function("graft_bloom_might_contain", lit(bytes), col("g"))).count()
    assert(misses === 0L, "a Bloom filter must never reject an inserted key")
  }

  test("probe agrees with the driver-side sketch on non-members (fpp bound)") {
    val sp = spark
    import sp.implicits._
    BloomFunctions.register(spark)
    val inserted = (1 to 1000).map(i => s"in-$i")
    val probesOnly = (1 to 1000).map(i => s"out-$i")
    val df = inserted.toDF("g")
    val bloom = df.stat.bloomFilter("g", 1000L, 0.001)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // the distributed probe expression and the driver-side sketch must
    // answer identically key-for-key (same hash path: UTF-8 bytes)
    val sparkAnswers = probesOnly.toDF("g")
      .select(col("g"),
        call_function("graft_bloom_might_contain", lit(bytes), col("g")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probesOnly.foreach { k =>
      assert(sparkAnswers(k) === bloom.mightContainString(k),
        s"distributed probe diverged from sketch on $k")
    }
    // and at fpp=0.1% the 1000 non-members should essentially all miss
    val fps = sparkAnswers.values.count(identity)
    assert(fps <= 10, s"implausible false-positive count $fps / 1000 at fpp=0.001")
  }

  test("plan: bloom probe filters the corpus side BELOW the verify join") {
    val out = DedupOps.queries("q74_bloom_decontam")(spark, d)
    val plan = out.queryExecution.executedPlan.toString
    out.unpersist(blocking = true)
    // InMemoryRelation's treeString prints the cached child plan, so the
    // probe-under-join structure stays auditable on the persisted frame
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"expected the native bloom probe in the physical plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "corpus-shaped join in q74 plan")
  }

  test("a per-row (non-foldable) filter argument is rejected at analysis time") {
    val sp = spark
    import sp.implicits._
    BloomFunctions.register(spark)
    // the expression deserializes the filter ONCE from a constant; a bloom
    // COLUMN would throw at task time (or probe one stale filter) — it
    // must fail analysis instead
    val df = Seq(("key", Array[Byte](1, 2, 3))).toDF("g", "bloom")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bloom_might_contain", col("bloom"), col("g"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("constant"), e.getMessage)
  }

  test("empty eval side returns an empty frame, not an error") {
    val sp = spark
    import sp.implicits._
    // all doc_ids >= 10 → no eval docs → zero eval grams
    val docs = Seq((10L, "a b c d e f g"), (11L, "h i j k l m n"))
      .toDF("doc_id", "text")
    val out = collectAndRelease(DedupOps.bloomDecontam(docs))
    assert(out.isEmpty)
  }
}
