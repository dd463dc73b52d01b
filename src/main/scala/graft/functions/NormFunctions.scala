package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[NfcNormalize]] — static so generated code can call
  * it directly (the MinhashLanes/HashKernels pattern).
  */
object NormKernels {

  /** Unicode NFC normalization of a UTF8String.
    *
    * Fast path: a pure-ASCII string is definitionally NFC — detected as
    * `numBytes == numChars` (every codepoint one byte), a byte scan with
    * no java.lang.String materialization, which is the overwhelmingly
    * common case in a web corpus. Non-ASCII strings that are already
    * normalized (precomposed é etc.) return the ORIGINAL UTF8String after
    * a quick-check, so only genuinely denormalized rows pay the
    * decompose/recompose allocation.
    */
  def nfc(u: UTF8String): UTF8String = {
    if (u.numBytes() == u.numChars()) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the first stage of the ftfy/Dolma-class text cleanup a
  * training corpus needs (combining sequences → precomposed forms, so
  * dedup fingerprints and token counts agree across sources that encode
  * the same text differently). Spark has no built-in normalizer; a Scala
  * UDF would break whole-stage codegen and serialize every row through a
  * closure — this expression stays inside the codegen span and calls the
  * static kernel.
  *
  * NFC is the right form for pipeline text (lossless, canonical); NFKC's
  * compatibility folding is lossy and intentionally not offered here.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.NormKernels.nfc($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NormFunctions {
  @volatile private var registered = Set.empty[SparkSession]

  /** Register `graft_nfc(s)` in the session's function registry so it is
    * usable from `expr(...)` and `spark.sql(...)`.
    */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nfc", exprs => NfcNormalize(exprs.head), "scala_udf")
      registered += spark
    }
  }
}
