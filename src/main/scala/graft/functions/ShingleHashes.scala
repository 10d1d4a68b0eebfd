package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling hashes of a (pre-lowercased) text's word n-gram shingles as
  * ONE native expression — `array<long>`, one entry per shingle
  * (duplicates kept; consumers that need sets dedup downstream).
  *
  * Exists because the Column-composed spelling —
  * `transform(shingles(text, n), s => RollingHash(s))` — rides on
  * `ArrayTransform`, a CodegenFallback higher-order function: ONE such
  * lambda tips the whole projection out of whole-stage codegen into
  * interpreted eval (regex split, sequence/slice/concat_ws
  * allocations, boxed lambda calls per shingle). Measured on the
  * decontamination row at sf0.1: 3.6 s interpreted → 0.3 s through
  * this expression. Same tokenize/shingle/hash semantics as
  * [[MinHashSig]] (`\s+` tokens, windows of n joined by one space,
  * short docs contribute ONE all-tokens shingle, 31-ary rolling hash
  * mod 2^31−1 — the hash the DuckDB oracles replicate); null → null.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.sql}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.compute(input.asInstanceOf[UTF8String], n))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(
         |      graft.functions.ShingleHashes.compute($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  /** Column-level entry point; caller supplies lowercasing (compose as
    * `ShingleHashes(lower(col), n)`). */
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      ShingleHashes(GraftColumnBridge.expression(c), n))

  private final val Prime = 2147483647L

  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Prime)

  /** Called from generated code — keep the signature stable. */
  def compute(u: UTF8String, n: Int): Array[Long] = {
    val toks = u.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(roll(toks.mkString(" ")))
    else {
      val out = new Array[Long](toks.length - n + 1)
      var s = 0
      while (s + n <= toks.length) {
        out(s) = roll(toks.slice(s, s + n).mkString(" "))
        s += 1
      }
      out
    }
  }
}
