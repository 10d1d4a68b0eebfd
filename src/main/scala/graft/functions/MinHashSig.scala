package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-value MinHash signature of a (pre-lowercased) text as ONE native
  * map-only Catalyst expression — the per-row form of
  * `Dedup.minhashSignature`'s relational pipeline (window-lead shingle
  * assembly → explode → k min-aggregates per doc). That pipeline costs
  * TWO shuffles per corpus pass (the `Window.partitionBy(doc)` that
  * assembles n-grams, then the groupBy that min-aggregates), both of
  * which exist only to reassemble per-document state; this expression
  * slides the n-gram window over the row's own tokens and keeps k
  * running minima in one pass, so signatures become a shuffle-free
  * projection. Codegen emits one static call ([[MinHashSig.compute]])
  * that stays inside the generated stage.
  *
  * Bit-exact with the relational form (pinned by LlmSpec): shingles are
  * `\s+` tokens joined with a single space over a sliding window of n
  * (documents with fewer than n tokens contribute ONE shingle — all
  * their tokens joined, the empty string for zero tokens), each shingle
  * is rolling-hashed once mod 2^31−1, and value i is the minimum over
  * shingles of the `a:i`/`b:i`-seeded affine remix. Null input → null
  * (the relational form produces no row there).
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.sql}")
    else if (n < 1 || k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, k >= 1")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSig.compute(input.asInstanceOf[UTF8String], n, k))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(
         |      graft.functions.MinHashSig.compute($c, $n, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point; caller supplies lowercasing. */
  def apply(c: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(c), n, k))

  private final val Prime = 2147483647L

  // the same `a:i`/`b:i` seeded constants as Dedup.mixA/mixB (mirrored
  // derivation; LlmSpec pins signature equality with the relational
  // form, which transitively pins these). Grown on demand, cached.
  private def roll(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Prime)
  @volatile private var mixes: Array[(Long, Long)] = Array.empty
  private def mix(i: Int): (Long, Long) = {
    var m = mixes
    if (i >= m.length) synchronized {
      m = mixes
      if (i >= m.length) {
        m = Array.tabulate(math.max(i + 1, 32))(j =>
          ((roll(s"a:$j") % (Prime - 1)) + 1, roll(s"b:$j") % Prime))
        mixes = m
      }
    }
    m(i)
  }

  /** One-pass k-minima MinHash over n-gram shingles of `u`. Called from
    * generated code — keep the signature stable. */
  def compute(u: UTF8String, n: Int, k: Int): Array[Long] = {
    val toks = u.toString.split("\\s+").filter(_.nonEmpty)
    val mins = Array.fill(k)(Long.MaxValue)
    def add(shingle: String): Unit = {
      val h = roll(shingle)
      var i = 0
      while (i < k) {
        val (a, b) = mix(i)
        val m = (h * a + b) % Prime
        if (m < mins(i)) mins(i) = m
        i += 1
      }
    }
    if (toks.length < n) add(toks.mkString(" "))
    else {
      var s = 0
      while (s + n <= toks.length) {
        add(toks.slice(s, s + n).mkString(" "))
        s += 1
      }
    }
    mins
  }
}
