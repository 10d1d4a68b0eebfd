package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Number of DISTINCT elements of a `array<long>` column present in a
  * fixed sorted long set — exact broadcast-set membership as a map-only
  * scalar.
  *
  * The relational form of this test (explode → join the set → count
  * distinct per row key) re-keys the corpus through an aggregation
  * exchange just to reassemble per-row state, and a literal
  * `array_intersect` embeds the whole set into generated source (and
  * rebuilds a hash set PER ROW). Here the set rides along as one sorted
  * `long[]` reference object shared by every row in the task — binary
  * search per element, a short-lived per-row dedup set for the matched
  * values only. This is what makes [[graft.llm.Dedup.decontaminateSet]]
  * a pure projection, and therefore usable inside Structured Streaming
  * (stream-side per-row decision, no stream-stream join, no state) —
  * see `Events.decontaminateStream`.
  *
  * NULL array → NULL; null ELEMENTS are skipped (they match nothing).
  */
case class CountInSet(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

  // binarySearch silently miscounts on an unsorted/duplicated array, so
  // the invariant the companion apply establishes is enforced here too
  // (direct construction is legal — e.g. from a SQL-name builder)
  require(sorted.length <= 1 ||
    (1 until sorted.length).forall(i => sorted(i - 1) < sorted(i)),
    "CountInSet: set array must be strictly increasing " +
      "(use the companion apply, which sorts and dedups)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_set"

  override def nullSafeEval(input: Any): Any =
    CountInSet.compute(input.asInstanceOf[ArrayData], sorted)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CountInSet.compute($c, $set);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSet = copy(child = newChild)
}

object CountInSet {
  /** Column entry point; `set` need not be sorted or distinct. */
  def apply(arr: Column, set: Array[Long]): Column =
    GraftColumnBridge.column(CountInSet(
      GraftColumnBridge.expression(arr), set.distinct.sorted))

  /** Called from generated code — keep the signature stable. */
  def compute(ad: ArrayData, sorted: Array[Long]): Int = {
    val n = ad.numElements()
    var matched: java.util.HashSet[java.lang.Long] = null
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val v = ad.getLong(i)
        if (java.util.Arrays.binarySearch(sorted, v) >= 0) {
          if (matched == null) matched = new java.util.HashSet[java.lang.Long]()
          matched.add(v)
        }
      }
      i += 1
    }
    if (matched == null) 0 else matched.size()
  }
}
