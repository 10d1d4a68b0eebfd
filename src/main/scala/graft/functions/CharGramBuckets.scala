package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram bucket COUNTS of a (pre-lowercased) text as one
  * native expression — `array<long>` of length `dim`, entry b = how
  * many of the text's n-char grams hash into bucket b.
  *
  * Semantics are exactly TextAnalysis.charGramFeatures' former
  * per-position spelling,
  * `pmod(tokenHash(substring(t, i, n)), dim)` counted over every gram
  * start i — the same 31-ary rolling hash mod 2^31−1 over UTF-16 code
  * units ([[RollingHash]]), with gram windows measured in CODE POINTS
  * (SQL `substring` counts code points, so a non-BMP char is one
  * window step but contributes its two surrogate units to the hash).
  * Texts shorter than n code points yield all-zero counts (the caller
  * filters them out; zero-count buckets are dropped after the explode
  * either way).
  *
  * Exists because the positional spelling generated one row PER
  * CHARACTER of the corpus through a Generate, allocated a fresh
  * n-char UTF8String + java.lang.String per position for the hash,
  * and then paid a corpus-positions-sized hash aggregate just to
  * count collisions into `dim` buckets — per-doc work that one tight
  * fused loop does allocation-free (r18, ta_langid_trained
  * 3.8 → measured probe; guide §1.2/§4). The downstream rows
  * (doc, dim, cnt) are value-identical, so the oracle replay and the
  * LlmSpec training pins are untouched.
  */
case class CharGramBuckets(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.sql}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1")
    else if (dim < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs dim >= 1")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_buckets"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      CharGramBuckets.compute(input.asInstanceOf[UTF8String], n, dim))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(
         |      graft.functions.CharGramBuckets.compute($c, $n, $dim));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CharGramBuckets = copy(child = newChild)
}

object CharGramBuckets {
  /** Column-level entry point; caller supplies lowercasing (compose as
    * `CharGramBuckets(lower(col), n, dim)`). */
  def apply(c: Column, n: Int, dim: Int): Column =
    GraftColumnBridge.column(
      CharGramBuckets(GraftColumnBridge.expression(c), n, dim))

  private final val Prime = 2147483647L

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String, n: Int, dim: Int): Array[Long] = {
    val s = u.toString
    val len = s.length
    val out = new Array[Long](dim)
    if (len == 0) return out
    // code point start offsets in UTF-16 units: starts(i) = unit
    // offset of the i-th code point, starts(m) = len. Windows advance
    // by code points (SQL substring semantics); the hash folds the
    // window's UTF-16 units (RollingHash semantics).
    val starts = new Array[Int](len + 1)
    var m = 0
    var i = 0
    while (i < len) {
      starts(m) = i
      m += 1
      i += (if (Character.isHighSurrogate(s.charAt(i)) && i + 1 < len &&
        Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
    }
    starts(m) = len
    var w = 0
    while (w + n <= m) {
      var acc = 0L
      var j = starts(w)
      val end = starts(w + n)
      while (j < end) {
        acc = (acc * 31L + s.charAt(j)) % Prime
        j += 1
      }
      out((acc % dim).toInt) += 1
      w += 1
    }
    out
  }
}
