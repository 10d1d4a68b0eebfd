package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Number of DISTINCT elements of an `array<long>` column that MIGHT be
  * in a Bloom filter — [[CountInSet]]'s scale sibling for membership
  * sets too large to ship exactly.
  *
  * The exact sorted-set form collects every distinct key to the driver;
  * fine at eval-suite size (3 MB-class), impossible for a contamination
  * registry of billions of n-grams (every benchmark ever released plus
  * heldout splits). A Bloom filter at that size is ~1.2 GB per 10⁹ keys
  * at 1% fpp — broadcastable — and errs in the SAFE direction for
  * decontamination: no false negatives (a contaminated doc can never
  * slip through), a tunable fpp fraction of clean docs over-dropped.
  * Same codegen/reference-object shape as CountInSet: map-only, stream-
  * composable, no exchange.
  *
  * NULL array → NULL; null elements are skipped.
  */
case class CountInBloom(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_bloom"

  override def nullSafeEval(input: Any): Any =
    CountInBloom.compute(input.asInstanceOf[ArrayData], bloom)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CountInBloom.compute($c, $b);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInBloom = copy(child = newChild)
}

object CountInBloom {
  def apply(arr: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(CountInBloom(
      GraftColumnBridge.expression(arr), bloom))

  /** Called from generated code — keep the signature stable. */
  def compute(arr: ArrayData, bloom: BloomFilter): Int = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (bloom.mightContainLong(v)) seen.add(v)
      }
      i += 1
    }
    seen.size()
  }
}
