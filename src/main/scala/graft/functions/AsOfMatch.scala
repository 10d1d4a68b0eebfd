package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Matched-timestamp lookup for the broadcast as-of join
  * ([[graft.operators.AsOfJoin.broadcastAsOf]]): for a (key, ts) pair,
  * the timestamp (epoch micros) of the as-of-matching right row, found
  * by binary search in a BROADCAST per-key sorted long[] index — a
  * map-only scalar, no shuffle, no window.
  *
  * The index rides as a `Broadcast` handle: the expression tree
  * serializes a few bytes per task and each executor fetches the index
  * once (torrent), instead of every task closure carrying a copy.
  * Returns NULL when the key is absent, inputs are null, or no right
  * row satisfies the direction/tolerance — the caller's equi-join on
  * the result then misses, giving left-outer semantics.
  *
  * `direction`: 0 = backward (latest ts' <= ts), 1 = forward (earliest
  * ts' >= ts), 2 = nearest (closer of the two, ties backward).
  * `toleranceUs` < 0 means unbounded.
  */
case class AsOfMatchTs(left: Expression, right: Expression,
    index: Broadcast[java.util.HashMap[String, Array[Long]]],
    direction: Int, toleranceUs: Long) extends BinaryExpression {

  require(direction >= 0 && direction <= 2,
    s"direction must be 0 (backward), 1 (forward) or 2 (nearest): $direction")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (string key, bigint ts), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_asof_match_ts"

  override def nullSafeEval(k: Any, t: Any): Any = {
    val r = AsOfMatchTs.lookup(index, k.asInstanceOf[UTF8String].toString,
      t.asInstanceOf[Long], direction, toleranceUs)
    if (r == Long.MinValue) null else r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("asofIndex", index,
      classOf[Broadcast[_]].getName)
    val r = ctx.freshName("asofMatch")
    nullSafeCodeGen(ctx, ev, (k, t) => {
      s"""
         |long $r = graft.functions.AsOfMatchTs.lookup(
         |  $bc, $k.toString(), $t, $direction, ${toleranceUs}L);
         |if ($r == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfMatchTs =
    copy(left = newLeft, right = newRight)
}

object AsOfMatchTs {
  /** Called from generated code — keep the signature stable.
    * Long.MinValue is the no-match sentinel (epoch micros can't reach
    * it: it would be the year -292275). */
  def lookup(bc: Broadcast[java.util.HashMap[String, Array[Long]]],
             key: String, ts: Long, direction: Int, tolUs: Long): Long = {
    val arr = bc.value.get(key)
    if (arr == null || arr.length == 0) return Long.MinValue
    val p = java.util.Arrays.binarySearch(arr, ts)
    val (bi, fi) = if (p >= 0) (p, p) else { val ins = -p - 1; (ins - 1, ins) }
    val backOk = bi >= 0 && (tolUs < 0 || ts - arr(bi) <= tolUs)
    val fwdOk = fi < arr.length && (tolUs < 0 || arr(fi) - ts <= tolUs)
    direction match {
      case 0 => if (backOk) arr(bi) else Long.MinValue
      case 1 => if (fwdOk) arr(fi) else Long.MinValue
      case _ =>
        if (backOk && fwdOk)
          // ties (equal distance) resolve to the backward row
          if (ts - arr(bi) <= arr(fi) - ts) arr(bi) else arr(fi)
        else if (backOk) arr(bi)
        else if (fwdOk) arr(fi)
        else Long.MinValue
    }
  }
}
