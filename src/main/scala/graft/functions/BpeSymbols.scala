package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A word's BPE symbol sequence after applying an ordered merge list —
  * characters initially, then each merge (l, r) replaces adjacent
  * [l, r] with l+r in one left-to-right scan, in merge order (the
  * standard BPE application rule).
  *
  * One native expression applying ALL merges in a single pass, because
  * the composed alternatives both fail structurally: per-merge
  * expression nesting grows the plan linearly with the merge count
  * (and recompiles per training iteration — the PqAssignCodes lesson),
  * and any `transform`-lambda spelling drops the projection out of
  * whole-stage codegen entirely (the ShingleHashes lesson). The merge
  * list rides as a reference object; training passes it grown by one
  * each Lloyd-style iteration.
  *
  * NULL word → NULL. Runs on the WORD-FREQUENCY table (vocab-sized),
  * not the corpus — the classic BPE trick that makes iteration cheap
  * at any corpus scale.
  */
case class BpeSymbols(child: Expression, merges: Array[String])
    extends UnaryExpression {

  require(merges.length % 2 == 0, "merges must be (l, r) pairs, flattened")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_symbols"

  override def nullSafeEval(input: Any): Any =
    BpeSymbols.compute(input.asInstanceOf[UTF8String], merges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BpeSymbols.compute($c, $m);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeSymbols = copy(child = newChild)
}

object BpeSymbols {
  /** Column entry point; merges as ordered (l, r) pairs. */
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeSymbols(
      GraftColumnBridge.expression(word),
      merges.flatMap(p => Seq(p._1, p._2)).toArray))

  /** Codepoint split + ordered merge application — shared by
    * [[compute]] and [[BpeEncodeIds]]. */
  def symbolList(word: String,
                 merges: Array[String]): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < merges.length) {
      val l = merges(m); val r = merges(m + 1)
      val next = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == l && syms.get(j + 1) == r) {
          next.add(l + r); j += 2
        } else { next.add(syms.get(j)); j += 1 }
      }
      syms = next
      m += 2
    }
    syms
  }

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String, merges: Array[String]): ArrayData = {
    val syms = symbolList(u.toString, merges)
    val out = new Array[AnyRef](syms.size)
    var k = 0
    while (k < syms.size) {
      out(k) = UTF8String.fromString(syms.get(k)); k += 1
    }
    new GenericArrayData(out)
  }
}
