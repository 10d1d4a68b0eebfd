package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string, as a native Catalyst expression
  * with whole-stage codegen:
  *
  *   h = foldLeft(chars)(acc => (acc·31 + char) mod (2^31 − 1))
  *
  * Exactly the recurrence of TextAnalysis.tokenHash/fingerprint (and of
  * the DuckDB oracle's `list_reduce` replica), but evaluated as one tight
  * loop over the string's UTF-16 code units instead of a four-deep
  * interpreted higher-order-function tree
  * (split → filter → transform(ascii) → aggregate), which allocated two
  * intermediate arrays per evaluation. This expression is the hot inner
  * loop of MinHash shingle hashing, SimHash token hashing, and document
  * fingerprinting — the one place the built-in operators genuinely can't
  * express the computation efficiently.
  *
  * Code-unit note: equality with the HOF form holds for all BMP text
  * (ascii() of a 1-char string == its code unit there); the driver data
  * is ASCII/BMP.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i)) % 2147483647L
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))
}
