package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of every k-CODE-POINT gram of a string as one native
  * expression — `array<long>`, element i = xxHash64 (seed 42, Spark's
  * own XXH64) of the UTF-8 bytes of the gram starting at code point
  * i (0-based). Windows advance by code points — exactly SQL
  * `substring`'s counting — so element i hashes the same characters
  * `substring(s, i+1, k)` returns; texts shorter than k code points
  * yield an empty array.
  *
  * This is the narrow POSITION PROXY of the exact-substring-dedup
  * family (r18, guide §2.3 "shuffle keys and metadata instead of
  * payloads"): the former spelling materialized a fresh k-char
  * UTF8String per corpus position — twice, once per consumer — and
  * keyed the duplicate-gram aggregate on those 64-char strings. The
  * hash is a PROXY, not the answer: duplicate detection over hashes
  * admits false positives (≈ n²/2⁶⁴ birthday rate), so the consumer
  * re-verifies true gram equality on the (hash-duplicated) candidate set
  * before any position counts as duplicated — results stay exact, the
  * hash only decides how little data the wide path has to touch.
  * Hashing runs straight over the string's UTF-8 bytes (no per-gram
  * allocation, no UTF-16 transcoding).
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      GramHashes.compute(input.asInstanceOf[UTF8String], k))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(
         |      graft.functions.GramHashes.compute($c, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): GramHashes = copy(child = newChild)
}

object GramHashes {
  /** Column-level entry point. */
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      GramHashes(GraftColumnBridge.expression(c), k))

  private final val Seed = 42L

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String, k: Int): Array[Long] = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nBytes = u.numBytes()
    // byte offset of each code point's first byte; starts(m) = nBytes
    val starts = new Array[Int](nBytes + 1)
    var m = 0
    var i = 0
    while (i < nBytes) {
      starts(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(u.getByte(i))
    }
    starts(m) = nBytes
    if (m < k) return Array.emptyLongArray
    val out = new Array[Long](m - k + 1)
    var w = 0
    while (w + k <= m) {
      out(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + starts(w),
          starts(w + k) - starts(w), Seed)
      w += 1
    }
    out
  }
}
