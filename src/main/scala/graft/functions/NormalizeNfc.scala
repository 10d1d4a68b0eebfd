package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — canonical composition
  * via the JDK's `java.text.Normalizer` (no Spark built-in exists).
  *
  * Text pipelines need this before ANY hash-based operator: "café" in
  * composed (U+00E9) and decomposed (e + U+0301) forms is byte-distinct
  * — different shingle hashes, different MinHash signatures, different
  * exact-dedup keys — while rendering identically. Normalizing at
  * ingestion makes every downstream fingerprint canonical. Fast path:
  * `Normalizer.isNormalized` is O(n) with no allocation, and real-world
  * corpora are overwhelmingly already NFC, so the common case returns
  * the input UTF8String untouched.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm, so
  * the `ta_normalize` oracle row compares results hash-exact.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.NormalizeNfc.compute($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeNfc = copy(child = newChild)
}

object NormalizeNfc {
  def apply(c: Column): Column =
    GraftColumnBridge.column(NormalizeNfc(GraftColumnBridge.expression(c)))

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
