package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** (char, occurrence) tokens of a string as one native expression —
  * `array<string>`, element i = "c:k" where c is the string's i-th
  * CODE POINT (SQL `substring(nm, i, 1)` semantics) and k its
  * occurrence index among equal code points in position order. The
  * multiset-as-set encoding of the Jaro-Winkler blocking
  * ([[graft.operators.JaroWinklerJoin]]).
  *
  * Exists because the positional spelling — a per-character explode,
  * a `substring(nm, i, 1)` allocation per character, then a
  * `row_number` window partitioned by (name, char) to assign k —
  * paid a full exchange + sort of the corpus's character table just
  * to number occurrences a per-name counter computes in one pass
  * (r18, guide §2.4/§4). Tokens emit in position order; downstream
  * consumers re-rank by global frequency anyway. One deliberate
  * divergence: an EMPTY string yields an empty array, where
  * `sequence(1, length(nm))` yielded two degenerate ":k" tokens
  * (sequence(1,0) descends) — those tokens could never join a real
  * name's prefix (every real token starts with a code point) and an
  * empty name's prefix length is 0, so no result changes.
  */
case class CharOccToks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_occ_toks"

  override def nullSafeEval(input: Any): Any =
    CharOccToks.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CharOccToks.compute($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CharOccToks = copy(child = newChild)
}

object CharOccToks {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(CharOccToks(GraftColumnBridge.expression(c)))

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val n = s.length
    val counts = new java.util.HashMap[Integer, Integer]()
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val sb = new java.lang.StringBuilder(8)
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val k = counts.merge(cp, 1, (a, b) => a + b)
      sb.setLength(0)
      sb.appendCodePoint(cp).append(':').append(k.intValue())
      out.add(UTF8String.fromString(sb.toString))
    }
    new GenericArrayData(out.toArray)
  }
}
