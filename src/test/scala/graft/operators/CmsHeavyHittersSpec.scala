package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q147 count-min heavy hitters: exact top-20 values with the Spark
  * sketch validated in-band against its own exact counts (fixed seed —
  * the verdict is deterministic, the q26 discipline).
  */
class CmsHeavyHittersSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("top-20 matches the exact frequency table; every sketch probe in band") {
    val exact = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("w")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = ScaleOps.queries("q147_cms_heavy_hitters")(spark, d).collect()
    assert(got.length === exact.length)
    got.zip(exact).zipWithIndex.foreach { case ((g, (w, f)), i) =>
      assert(g.getLong(0) === (i + 1).toLong, "rank is positional")
      assert(g.getString(1) === w && g.getLong(2) === f, s"rank ${i + 1} exact value")
      assert(g.getLong(3) === 1L, s"$w: sketch estimate left the eps band")
    }
  }

  test("the sketch never underestimates (CMS structural guarantee)") {
    import spark.implicits._
    val tok = Seq.tabulate(5000)(i => s"t${i % 37}").toDF("w")
    val sketch = tok.stat.countMinSketch("w", 0.001, 0.999, 42)
    val exact = tok.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (w, c) =>
      assert(sketch.estimateCount(w) >= c, s"$w underestimated")
    }
  }
}
