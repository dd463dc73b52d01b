package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership test against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the row-local prefilter
  * that makes set-membership joins (benchmark decontamination, stop-lists,
  * URL blocklists) scale past the broadcast-hash-join envelope.
  *
  * A broadcast hash join ships and probes the FULL key set (a benchmark
  * suite's distinct n-grams can run to 10^8 keys ≈ GBs); the Bloom filter
  * is `-n·ln(fpp)/ln²2` BITS (~1.8 MB for 10^6 keys at 0.1% fpp), probes
  * in a handful of hash ops, and never returns a false NEGATIVE — so
  * `filter(might_contain) → exact verify join` computes the identical
  * result while the join only ever sees the ~fpp-sized survivor stream.
  * Same design as Spark's internal runtime-rowlevel-filtering expression
  * (`BloomFilterMightContain`), exposed here as a first-class function.
  *
  * `left` is the serialized filter (a foldable BINARY literal — the filter
  * is built once per query by an aggregation job, like a broadcast build);
  * `right` is the STRING key under test. Hashing contract: the sketch
  * library hashes a string's UTF-8 bytes (`putString` delegates to the
  * byte-array path), so probing with the UTF8String's bytes matches a
  * filter built by `DataFrameStatFunctions.bloomFilter` over the same
  * column, bit-for-bit.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != BinaryType ||
        right.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects (BINARY, STRING), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!left.foldable)
      // the filter deserializes once from left.eval() with NO input row
      // (see `filter` below) — a per-row bloom column would throw at task
      // time on the unbound attribute (or worse, silently probe one stale
      // filter); reject it at ANALYSIS time instead, like Spark's own
      // BloomFilterMightContain does
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_contain requires a constant (foldable) filter " +
          "argument — a serialized BloomFilter literal, not a per-row column")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // The filter deserializes ONCE per task (first eval) from the literal
  // bytes, not once per row; @transient keeps the deserialized form out of
  // the serialized expression tree.
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Row-level probe; public so generated code can call through the
    * reference object. */
  def mightContain(s: UTF8String): Boolean =
    filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(bloomBytes: Any, value: Any): Any =
    mightContain(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference `this` so codegen shares the lazily-deserialized filter
    // with interpreted eval — the literal child is never re-evaluated per
    // row in generated code either.
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {

  /** Serialize a built filter to the BINARY literal form
    * [[BloomMightContain]] probes — the one wire format shared by the
    * batch prefilter (q74), the streaming gate, and the specs.
    */
  def serialize(bloom: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Register `graft_bloom_might_contain(bloomBytes, key)` on the session.
    * Unconditional: createOrReplaceTempFunction is idempotent and cheap
    * (register runs once per QUERY construction, not per row), and a
    * seen-session guard would either strongly pin every stopped session's
    * state graph for the JVM lifetime (Set[SparkSession]) or need
    * non-public session identity.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomMightContain(exprs.head, exprs(1)), "scala_udf")
}
