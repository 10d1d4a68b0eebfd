package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range joins without the nested loop.
  *
  * Spark plans a join whose ON clause has no equality conjunct as
  * BroadcastNestedLoopJoin (or CartesianProduct when neither side fits
  * in memory) — every left row probes every right row, O(|L|·|R|),
  * which at 100 TB is not a plan but an outage. The reference's Trino
  * backend hides this behind its own join planner; here the fix is the
  * classic binning rewrite: quantize the point/interval domain into
  * fixed-width buckets, explode each interval into the buckets it
  * covers, and equi-join on the bucket id. Catalyst then plans a
  * shuffled (or broadcast) HASH join on the bucket with the exact range
  * predicate as a residual filter — the O(|L|+|R|+|matches|) shape,
  * and every downstream optimization (AQE, broadcast, skew handling)
  * applies because it IS an equi-join.
  *
  * Bucket width tuning: an interval of length `len` explodes into
  * `len/width + 1` bucket rows, while a narrow width sharpens the
  * residual filter. Set `bucketWidth` to the TYPICAL interval length —
  * explosion factor ≈ 2 and each probe touches ≤ 2 buckets' worth of
  * candidates. Skewed interval lengths (one interval covering the whole
  * domain) explode that one row into domain/width copies — cap with a
  * coarser width or split the outliers out.
  *
  * Domain is numeric (long/int/double epoch seconds, ids, positions…);
  * timestamp callers pass `unix_timestamp(ts)`. Bounds are INCLUSIVE on
  * both ends (SQL BETWEEN, the oracle twin). Null points/bounds and
  * inverted intervals (lo > hi) match nothing, exactly as BETWEEN.
  */
object RangeJoin {

  private val Bucket = "__graft_rj_bucket"

  import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
    LongType, ShortType}

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Integral divide via the catalyst node (`div`) — Spark's `/` on
    * longs is DOUBLE division. */
  private def ldiv(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Floor of c/width. For integral domains this is exact long
    * arithmetic (`div` + negative-remainder adjust): the former
    * `floor(c / width)` rode double division, which rounds ids past
    * 2^53 (snowflake-scale keys are an advertised domain) BEFORE the
    * floor. Within one join that corruption is survivable — rounding
    * is monotone, the interval explode covers a contiguous bucket
    * range, and the residual filter compares exact longs — but the
    * bucket ids themselves were wrong: a corpus PERSISTED
    * partitionBy(bucket) for layout-pruned probes (the operator's
    * 100 TB story) would disagree with any exact engine's bucketing of
    * the same domain, and mixed-type sides (long point vs double
    * interval) lose the shared-monotone-function guarantee. Fractional
    * domains keep the double form — their values carry double rounding
    * by nature. */
  private def bucketOf(c: org.apache.spark.sql.Column, width: Long,
                       integral: Boolean) =
    if (integral) {
      val cc = c.cast("long")
      val q = ldiv(cc, lit(width))
      when(cc % lit(width) < 0, q - 1).otherwise(q)
    } else floor(c / lit(width)).cast("long")

  /** Point-in-interval join: rows of `left` whose `pointCol` lies in
    * `[loCol, hiCol]` of a `right` row, optionally under extra equality
    * keys (`extraKeys` as (leftCol, rightCol) pairs — they join the
    * bucket AND the keys, shrinking candidates further). Inner join;
    * output carries all columns of both sides (names must not collide).
    *
    * Each left row lands in exactly ONE bucket, so a qualifying
    * (left, right) pair meets in exactly one bucket row — no dedup
    * step, no DISTINCT in the plan. */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = (left.columns ++ right.columns).contains(Bucket)
    require(!clash, s"column name $Bucket is reserved by RangeJoin")

    // ONE bucketing function for the whole join, decided by ALL the
    // operand types together: a mixed-type join (long point vs double
    // bounds) bucketing each side with a DIFFERENT function loses the
    // shared-monotone guarantee — near/above 2^53 an exact-long point
    // bucket can fall outside the double-rounded bucket range the
    // interval exploded into, silently dropping a true match. All
    // integral → exact long div; any fractional operand → everyone
    // rides the same double floor (self-consistent, as before r10).
    val integral = isIntegral(left.schema(pointCol).dataType) &&
      isIntegral(right.schema(loCol).dataType) &&
      isIntegral(right.schema(hiCol).dataType)
    val l = left.withColumn(Bucket,
      bucketOf(col(pointCol), bucketWidth, integral))
    // inverted/null intervals explode to nothing (sequence(a,b) with
    // a > b counts DOWN in Spark — the filter keeps it from matching)
    val r = right.filter(col(loCol) <= col(hiCol))
      .withColumn(Bucket, explode(sequence(
        bucketOf(col(loCol), bucketWidth, integral),
        bucketOf(col(hiCol), bucketWidth, integral))))
    val keyCond = extraKeys.map { case (lk, rk) => l(lk) === r(rk) }
    val cond = (l(Bucket) === r(Bucket)) +:
      (l(pointCol) >= r(loCol)) +: (l(pointCol) <= r(hiCol)) +: keyCond
    l.join(r, cond.reduce(_ && _), "inner")
      .drop(l(Bucket)).drop(r(Bucket))
  }

  /** Interval-overlap join: pairs of `left` `[lLo, lHi]` and `right`
    * `[rLo, rHi]` with `lLo <= rHi AND rLo <= lHi` (closed-interval
    * overlap). Both sides explode into their covered buckets; a pair
    * sharing several buckets would match once per shared bucket, so
    * the join keeps only the FIRST shared bucket — the bucket of
    * `greatest(lLo, rLo)`, which both sides provably cover — making
    * each qualifying pair match exactly once with no DISTINCT. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Long,
                      extraKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = (left.columns ++ right.columns).contains(Bucket)
    require(!clash, s"column name $Bucket is reserved by RangeJoin")

    // One shared bucketing function across BOTH sides and the
    // firstShared dedup predicate (see pointInInterval): per-side
    // integrality let a mixed-type pair explode with one function but
    // dedup with another — failing `firstShared` on every candidate
    // row, so the pair vanished instead of matching once.
    val integral = isIntegral(left.schema(lLo).dataType) &&
      isIntegral(left.schema(lHi).dataType) &&
      isIntegral(right.schema(rLo).dataType) &&
      isIntegral(right.schema(rHi).dataType)
    def exploded(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi))
        .withColumn(Bucket, explode(sequence(
          bucketOf(col(lo), bucketWidth, integral),
          bucketOf(col(hi), bucketWidth, integral))))
    val l = exploded(left, lLo, lHi)
    val r = exploded(right, rLo, rHi)
    val overlap = (l(lLo) <= r(rHi)) && (r(rLo) <= l(lHi))
    val firstShared =
      l(Bucket) === bucketOf(greatest(l(lLo), r(rLo)), bucketWidth,
        integral)
    val keyCond = extraKeys.map { case (lk, rk) => l(lk) === r(rk) }
    val cond = ((l(Bucket) === r(Bucket)) +: overlap +: firstShared +:
      keyCond).reduce(_ && _)
    l.join(r, cond, "inner").drop(l(Bucket)).drop(r(Bucket))
  }
}
