package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a (pre-lowercased) text as ONE native Catalyst
  * expression — the map-only form of `Dedup.simhash`'s relational
  * pipeline (explode tokens → 4 affine remixes → 60 signed bit-sums →
  * groupBy doc). Value at scale: the relational form's signature
  * aggregate shuffles a 60-column partial-sum row for EVERY document —
  * a corpus-wide shuffle that exists only to reassemble per-document
  * state the row already had. This expression computes the signature in
  * one pass over the row's own tokens, so signatures become a map-only
  * projection: no shuffle, no exchange, and the expression composes
  * into whole-stage codegen via a static call (the loop body is too
  * large to inline as generated Java, so codegen emits one call to
  * [[SimHash60.compute]] — still inside the generated stage, no
  * iterator boundary).
  *
  * Bit-exact with the relational form (pinned by LlmSpec over the real
  * corpus): token split is the same `\s+` Java regex with empties
  * dropped, token hash the same 31-ary rolling hash mod 2^31−1, mixes
  * the same `sh:a:b`-seeded affine maps, and bit j of the signature is
  * set when the ±1 sum over tokens (by bit j%15 of mix j/15) is
  * positive. Zero-token input returns NULL — the relational groupBy
  * produces no row for such documents, and the null keeps the two
  * forms' visible surfaces identical.
  *
  * Also the streaming enabler: a per-row signature needs no aggregation
  * state, so near-dup signatures work inside `readStream` pipelines
  * (see `Events.dedupStreamBySignature`).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // zero-token input → null
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any = {
    val sig = SimHash60.compute(input.asInstanceOf[UTF8String])
    if (sig == SimHash60.NoTokens) null else java.lang.Long.valueOf(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.SimHash60.compute($c);
         |${ev.isNull} = ${ev.value} == -1L; /* SimHash60.NoTokens */
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** Column-level entry point; caller supplies lowercasing (compose as
    * `SimHash60(lower(col))`) so case folding stays Spark's own. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHash60(GraftColumnBridge.expression(c)))

  /** Sentinel for "no tokens" (a real signature is a nonnegative 60-bit
    * value, so −1 is unreachable). Generated Java reads it through the
    * static forwarder `graft.functions.SimHash60.NoTokens()`. */
  final val NoTokens: Long = -1L

  private final val Prime = 2147483647L
  private final val Bands = 4
  private final val BandBits = 15

  // the same `sh:a:b`/`sh:b:b` seeded constants as Dedup.simhashMixA/B
  // (derivation mirrored here to keep this expression dependency-free;
  // LlmSpec pins signature equality with the relational form, which
  // transitively pins these)
  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Prime)
  private val MixA: Array[Long] =
    Array.tabulate(Bands)(b => (roll(s"sh:a:$b") % (Prime - 1)) + 1)
  private val MixB: Array[Long] =
    Array.tabulate(Bands)(b => roll(s"sh:b:$b") % Prime)

  /** One-pass 60-bit SimHash over `\s+`-separated tokens of `u`;
    * [[NoTokens]] when the text has no tokens. Called from generated
    * code — keep the signature (UTF8String → long) stable. */
  def compute(u: UTF8String): Long = {
    val toks = u.toString.split("\\s+")
    val sums = new Array[Int](Bands * BandBits)
    var any = false
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        any = true
        var th = 0L
        var i = 0
        while (i < tok.length) {
          th = (th * 31L + tok.charAt(i)) % Prime
          i += 1
        }
        var b = 0
        while (b < Bands) {
          val m = (th * MixA(b) + MixB(b)) % Prime
          var r = 0
          while (r < BandBits) {
            sums(b * BandBits + r) += (((m >>> r) & 1L) * 2 - 1).toInt
            r += 1
          }
          b += 1
        }
      }
      t += 1
    }
    if (!any) NoTokens
    else {
      var sig = 0L
      var j = 0
      while (j < Bands * BandBits) {
        if (sums(j) > 0) sig |= 1L << j
        j += 1
      }
      sig
    }
  }
}
