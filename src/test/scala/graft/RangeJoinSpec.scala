package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join vs the naive non-equi join (which Spark plans as
  * BroadcastNestedLoopJoin — the thing the operator exists to avoid). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Tables.load(spark, sf, "lineitem")
    .select(($"l_orderkey" * 10 + $"l_linenumber").as("event_id"),
      unix_timestamp($"l_shipdate").as("p"),
      ($"l_suppkey" % 50).as("user_id"))

  // non-uniform inclusive intervals from orders; some inverted (lo>hi
  // via negative length) and some null-bounded rows exercise the edges
  private def intervals = Tables.load(spark, sf, "orders")
    .filter($"o_orderkey" % 7 === 0)
    .select($"o_orderkey".as("iv_id"),
      unix_timestamp($"o_orderdate").as("lo"),
      (unix_timestamp($"o_orderdate") +
        ($"o_orderkey" % 40 - 2) * 86400L).as("hi"))
    .withColumn("lo", when($"iv_id" % 31 === 0, lit(null)).otherwise($"lo"))

  test("pointInInterval equals the naive BETWEEN join, inclusive bounds") {
    val got = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", bucketWidth = 86400L * 15)
      .select($"event_id", $"iv_id")
    val naive = points.as("l").join(intervals.as("r"),
        $"l.p" >= $"r.lo" && $"l.p" <= $"r.hi")
      .select($"event_id", $"iv_id")
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("pointInInterval plans a hash/merge equi-join, not a nested loop") {
    val got = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", bucketWidth = 86400L * 15)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("pointInInterval honors extra equality keys") {
    val byUser = intervals.withColumn("iv_user", $"iv_id" % 50)
    val got = RangeJoin.pointInInterval(points, "p", byUser,
        "lo", "hi", bucketWidth = 86400L * 15,
        extraKeys = Seq("user_id" -> "iv_user"))
      .select($"event_id", $"iv_id")
    val naive = points.as("l").join(byUser.as("r"),
        $"l.p" >= $"r.lo" && $"l.p" <= $"r.hi" &&
          $"l.user_id" === $"r.iv_user")
      .select($"event_id", $"iv_id")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("intervalOverlap equals the naive overlap join, exactly once per pair") {
    val a = intervals.select($"iv_id".as("a_id"), $"lo".as("a_lo"),
      $"hi".as("a_hi"))
    val b = Tables.load(spark, sf, "orders")
      .filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey".as("b_id"),
        unix_timestamp($"o_orderdate").as("b_lo"),
        (unix_timestamp($"o_orderdate") + ($"o_orderkey" % 25 + 1) *
          86400L).as("b_hi"))
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo",
        "b_hi", bucketWidth = 86400L * 10)
      .select($"a_id", $"b_id")
    // contract: inverted (lo > hi) intervals match nothing — the naive
    // predicate alone would still pair some inverted rows
    val naive = a.filter($"a_lo" <= $"a_hi")
      .join(b.filter($"b_lo" <= $"b_hi"),
        $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"a_id", $"b_id")
    assert(got.count() > 0)
    // exceptAll is multiset difference: both empty ⇒ same multiplicity
    // ⇒ the first-shared-bucket dedup emitted each pair exactly once
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("intervalOverlap honors extra equality keys") {
    val a = intervals.select($"iv_id".as("a_id"), $"lo".as("a_lo"),
      $"hi".as("a_hi"), ($"iv_id" % 5).as("a_k"))
    val b = Tables.load(spark, sf, "orders")
      .filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey".as("b_id"),
        unix_timestamp($"o_orderdate").as("b_lo"),
        (unix_timestamp($"o_orderdate") + ($"o_orderkey" % 25 + 1) *
          86400L).as("b_hi"), ($"o_orderkey" % 5).as("b_k"))
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo",
        "b_hi", bucketWidth = 86400L * 10,
        extraKeys = Seq("a_k" -> "b_k"))
      .select($"a_id", $"b_id")
    val naive = a.filter($"a_lo" <= $"a_hi")
      .join(b.filter($"b_lo" <= $"b_hi"),
        $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi" && $"a_k" === $"b_k")
      .select($"a_id", $"b_id")
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("bucket-boundary and degenerate intervals") {
    val l = Seq((1L, 0L), (2L, 100L), (3L, 99L), (4L, -100L), (5L, -1L))
      .toDF("id", "p")
    val r = Seq((10L, 0L, 0L),       // single point at a bucket edge
                (11L, 100L, 99L),    // inverted: matches nothing
                (12L, -150L, -100L), // negative domain across buckets
                (13L, 99L, 100L))    // straddles the bucket boundary
      .toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(l, "p", r, "lo", "hi", 100L)
      .select($"id", $"iv").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (4L, 12L), (3L, 13L), (2L, 13L)))
  }

  test("mixed-type join near 2^53 buckets both sides with ONE function") {
    // r10 regression (ADVICE r11): an integral point bucketed with
    // exact long div while double interval bounds bucketed with double
    // floor — two different monotone functions. Near 2^53 a long point
    // just below a bucket boundary rounds UP when promoted to double,
    // so its exact bucket (k-1) fell outside the interval's
    // double-rounded bucket range {k} and the true match (true under
    // Spark's promote-to-double residual compare) silently vanished.
    // One shared function (all-double here, since one side is
    // fractional) must agree with the naive join.
    val base = 1L << 53
    val w = 1000L
    // p = k*w - 1 for a k whose multiple is ≥ 2^53: as double it
    // rounds up across the bucket boundary
    val k = base / w + 5
    val p = k * w - 1       // odd, ≥ 2^53 → not double-representable
    val pts = Seq((1L, p), (2L, base + 2L)).toDF("id", "p")
    val ivs = Seq((10L, (k * w).toDouble, (k * w + 10).toDouble),
                  (11L, base.toDouble, (base + 4L).toDouble))
      .toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", w)
      .select($"id", $"iv").as[(Long, Long)].collect().toSet
    val naive = pts.as("l").join(ivs.as("r"),
        $"l.p" >= $"r.lo" && $"l.p" <= $"r.hi")
      .select($"id", $"iv").as[(Long, Long)].collect().toSet
    assert(naive.contains((1L, 10L)),
      "fixture lost its point: p must promote into the interval")
    assert(got === naive, s"got $got want $naive")
  }

  test("mixed-type intervalOverlap: shared bucketing incl. firstShared dedup") {
    // same class: left intervals integral longs, right doubles. The
    // per-side integrality let the explode use one function while the
    // firstShared dedup predicate used another — a qualifying pair
    // could fail firstShared on EVERY candidate row and vanish.
    val base = 1L << 53
    val w = 1000L
    val k = base / w + 5
    val a = Seq((1L, k * w - 3, k * w - 1), (2L, base + 2L, base + 6L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, (k * w).toDouble - 2, (k * w).toDouble + 10),
                (11L, base.toDouble, (base + 4L).toDouble))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo",
        "b_hi", w)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted
    val naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted
    assert(naive.nonEmpty)
    // multiset equality: each qualifying pair exactly once
    assert(got.toSeq === naive.toSeq, s"got $got want $naive")
  }
}
