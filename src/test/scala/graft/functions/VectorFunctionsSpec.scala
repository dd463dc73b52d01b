package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nullability and codegen contract of the native expressions
  * (`graft_dot`, `graft_minhash_lanes`, `graft_simhash16`).
  *
  * The load-bearing tests are the `IS NULL over a non-nullable child` pair:
  * both hash expressions return null for an empty/all-null input array, so
  * they must declare `nullable = true` UNCONDITIONALLY. With the inherited
  * `nullable = child.nullable` (the r6/r7 ADVICE defect), an `array()`
  * literal child made the expression claim non-nullable, and the optimizer's
  * null-aware rules folded `IS NULL` to literal false — a silently wrong
  * result through the user-facing SQL registration.
  */
class VectorFunctionsSpec extends SparkSpec {

  private def registered = {
    VectorFunctions.register(spark)
    spark
  }

  test("graft_simhash16 over a non-nullable empty array literal IS NULL") {
    // goes through spark.sql so the full analyzer+optimizer pipeline runs;
    // constant folding must evaluate to null, not fold IsNull to false
    val r = registered.sql("SELECT graft_simhash16(array()) IS NULL AS n")
    assert(r.head.getBoolean(0), "simhash16(array()) IS NULL was optimized to false")
    assert(registered.sql("SELECT graft_simhash16(array())").head.isNullAt(0))
  }

  test("graft_minhash_lanes over a non-nullable empty array literal IS NULL") {
    val r = registered.sql("SELECT graft_minhash_lanes(array()) IS NULL AS n")
    assert(r.head.getBoolean(0), "minhash_lanes(array()) IS NULL was optimized to false")
    assert(registered.sql("SELECT graft_minhash_lanes(array())").head.isNullAt(0))
  }

  test("null-result survives the optimizer over a non-nullable COLUMN child") {
    // non-literal path: a filter on IS NULL over a column the analyzer
    // types as non-nullable array; with nullable=false the optimizer
    // rewrites the filter to an empty relation and drops every row
    val df = registered.range(4)
      .select(col("id"),
        when(col("id") % 2 === 0, expr("array()"))
          .otherwise(expr("array(CAST(id AS STRING))")).as("toks"))
      .select(col("id"), expr("graft_simhash16(toks)").as("s"),
        expr("graft_minhash_lanes(toks)").as("m"))
    assert(df.filter(col("s").isNull).count() === 2)
    assert(df.filter(col("m").isNull).count() === 2)
  }

  test("both expressions declare nullable=true regardless of child nullability") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val nonNullableChild = Literal.create(Seq("a"), ArrayType(StringType, false))
    assert(!nonNullableChild.nullable)
    assert(MinhashLanes(nonNullableChild).nullable)
    assert(Simhash16(nonNullableChild).nullable)
  }

  test("all-null elements behave like an empty array (null result)") {
    val r = registered.sql(
      "SELECT graft_simhash16(array(CAST(NULL AS STRING))) AS s, " +
        "graft_minhash_lanes(array(CAST(NULL AS STRING))) AS m")
    assert(r.head.isNullAt(0) && r.head.isNullAt(1))
  }

  test("generated code matches interpreted eval (no CodegenFallback)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val child = Literal.create(Seq("a"), ArrayType(StringType))
    assert(!MinhashLanes(child).isInstanceOf[CodegenFallback])
    assert(!Simhash16(child).isInstanceOf[CodegenFallback])
    // evaluate the same rows through the codegen'd projection (DataFrame
    // path, wholestage on) and the interpreted kernel directly
    val toks = Seq(Seq("the", "quick", "brown", "fox"), Seq("lorem", "ipsum"), Seq())
    import spark.implicits._
    val rows = toks.toDF("t")
      .select(expr("graft_simhash16(t)").as("s"), expr("graft_minhash_lanes(t)").as("m"))
      .collect()
    toks.zip(rows).foreach { case (ts, row) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val expS = HashKernels.simhash16(arr)
      val expM = HashKernels.minhashLanes(arr)
      if (expS == null) assert(row.isNullAt(0)) else assert(row.getLong(0) === expS.longValue())
      if (expM == null) assert(row.isNullAt(1))
      else assert(row.getSeq[String](1) === (0 until 8).map(i => expM.getUTF8String(i).toString))
    }
  }
}
