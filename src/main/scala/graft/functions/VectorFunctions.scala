package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the dot product of two ARRAY<DOUBLE>
  * columns — the hot primitive of similarity search (SURVEY.md §7.1 M6).
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)` builds an
  * intermediate array and evaluates two lambdas per element in the
  * interpreter; this expression is a tight loop that participates in
  * whole-stage codegen — ~50× faster on 64-dim vectors, which turns the
  * all-pairs similarity join from minutes into seconds at sf0.1.
  *
  * Summation is sequential left-to-right, bit-identical to the previous
  * formulation and to DuckDB's list_dot_product (oracle parity).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** All 8 minhash lane minima of a shingle array in ONE pass — the hot
  * primitive of the LSH dedup chain (SURVEY.md §7.1 M6).
  *
  * The SQL formulation (`transform(sh, x -> sha2(x, 256))` + 8 ×
  * `array_min(transform(ms, m -> substring(m, 1+8i, 8)))`) runs its lambdas
  * in the interpreter (higher-order functions don't codegen), allocates a
  * fresh MessageDigest per sha2 call, materializes every 64-hex digest
  * string, and traverses the digest array nine times. This expression
  * reuses one digest, compares lanes as unsigned 32-bit ints, and renders
  * only the 8 winning lanes as lowercase hex — bit-identical output
  * (lowercase-hex lexicographic min == numeric min), so the DuckDB oracle
  * formulation is unchanged.
  *
  * Returns null for an empty (or all-null) array, like `array_min` over an
  * empty transform result; null elements are skipped like `array_min`.
  * Because a non-null input can yield a null RESULT, `nullable` must be an
  * unconditional `true` — inheriting `child.nullable` would let null-aware
  * optimizer rules (IsNull folding, null-check elimination) miscompile
  * queries over non-nullable children (array literals, non-null columns).
  */
case class MinhashLanes(child: Expression)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashLanes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.HashKernels.minhashLanes($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashLanes =
    copy(child = newChild)
}

/** 16-bit SimHash of a token array in one pass — row-local, so the q36
  * chain shuffles one row per DOCUMENT instead of one per token occurrence
  * (the SQL formulation explodes tokens and aggregates 16 vote columns by
  * doc_id — a corpus-token-sized shuffle at scale).
  *
  * Bit-identical to the SQL/DuckDB formulation: per token, the first 4 hex
  * digits of md5 (= first 2 digest bytes, big-endian) vote ±1 per bit over
  * every OCCURRENCE (duplicates and empty tokens included); a bit is set
  * iff its vote sum is > 0. Null for an empty/all-null array (the SQL
  * groupBy simply has no row) — so, as for [[MinhashLanes]], `nullable`
  * must be an unconditional `true` regardless of the child's nullability.
  */
case class Simhash16(child: Expression)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sim")
      s"""
         |java.lang.Long $tmp = graft.functions.HashKernels.simhash16($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) fold for PQ search: given a candidate's m
  * PQ codes as a subspace-ordered ARRAY<INT> and a query's dense LUT as a
  * (subspace, code)-ordered ARRAY<DOUBLE> of m×k rounded subdistances,
  * returns Σ_s lut[s·k + codes[s]] — the IVF-PQ approximate distance
  * before its final 6-decimal round. k is inferred per row
  * (lut.length / codes.length), so the expression needs no geometry
  * literals and survives any retrain that changes m or k together.
  *
  * This is the [[ArrayDot]] rationale applied to the ADC hot loop: the
  * higher-order `aggregate(...element_at(map)...)` formulation evaluates
  * two interpreted lambdas plus an O(k) linear map probe per subspace
  * per row (~20 µs/row measured on the 10× smoke — the whole q135 wall),
  * where this loop is a handful of array loads inside whole-stage
  * codegen. Summation is sequential ascending-subspace; the caller
  * rounds the total to 6, which is the order-stability argument every
  * ADC oracle already relies on.
  *
  * Null for null inputs, for an empty codes array, and for any code that
  * indexes outside the LUT (a geometry mismatch — surfacing as null
  * fails the top-k loudly instead of silently mis-ranking).
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("adc")
      s"""
         |java.lang.Double $tmp = graft.functions.HashKernels.adcSum($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

/** Row-local hash kernels shared by the interpreted `nullSafeEval` paths and
  * the generated code of [[MinhashLanes]] / [[Simhash16]] (codegen calls the
  * static forwarders, e.g. `graft.functions.HashKernels.minhashLanes(...)`).
  * One `MessageDigest` per thread — codegen'd projections are single-threaded
  * per task, so a ThreadLocal removes the per-row allocation without locking.
  */
object HashKernels {

  private val nLanes = 8

  private val sha256 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("SHA-256"))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** All 8 unsigned-32-bit lane minima of one sha256 per element, rendered
    * as 8-hex-char strings; null for an empty/all-null array.
    */
  def minhashLanes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(nLanes)(0xFFFFFFFFL)
    var any = false
    val md = sha256.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var lane = 0
        while (lane < nLanes) {
          val o = 4 * lane
          val v = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
            ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
          if (v < mins(lane)) mins(lane) = v
          lane += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"$v%08x"): Any))
  }

  /** ADC fold: Σ_s lut[s·(lut.len/codes.len) + codes[s]]; null on empty
    * codes, non-divisible lengths, or an out-of-range code (see [[AdcSum]]).
    */
  def adcSum(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    val len = lut.numElements()
    if (m == 0 || len == 0 || len % m != 0) return null
    val k = len / m
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val code = codes.getInt(i)
      if (code < 0 || code >= k) return null
      val idx = i * k + code
      if (lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** 16-bit per-occurrence-vote simhash; null for an empty/all-null array. */
  def simhash16(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var count = 0
    val md = this.md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        count += 1
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        val h16 = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
        var b = 0
        while (b < 16) {
          votes(b) += (if (((h16 >> b) & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    if (count == 0) null
    else {
      var sim = 0L
      var b = 0
      while (b < 16) {
        if (votes(b) > 0) sim |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sim)
    }
  }
}

object VectorFunctions {
  @volatile private var registered = Set.empty[SparkSession]

  /** Register `graft_dot(a, b)` and `graft_minhash_lanes(arr)` in the
    * session's function registry so they are usable from `expr(...)` and
    * `spark.sql(...)`.
    */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => ArrayDot(exprs.head, exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_minhash_lanes", exprs => MinhashLanes(exprs.head), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_simhash16", exprs => Simhash16(exprs.head), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_adc_sum", exprs => AdcSum(exprs.head, exprs(1)), "scala_udf")
      registered += spark
    }
  }
}
