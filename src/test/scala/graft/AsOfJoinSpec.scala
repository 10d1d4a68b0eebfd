package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Broadcast (zero-shuffle) as-of join vs the window-based operator —
  * the two must agree row-for-row in every direction; they differ only
  * in plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables.load(spark, sf, "events")
  private def left = ev.filter(pmod($"event_id", lit(2)) === 1)
    .select($"event_id", $"user_id", $"ts")
  private def right = ev.filter(pmod($"event_id", lit(2)) === 0)
    .groupBy($"user_id", $"ts")
    .agg(max($"value").as("rv"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"event_id").collect().toSeq

  test("broadcastAsOf backward equals the window as-of") {
    val bc = AsOfJoin.broadcastAsOf(left, right, Seq("user_id"), "ts",
      Seq("rv"))
    val win = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("rv"))
    assert(bc.columns.toSeq === win.columns.toSeq)
    assert(sortedRows(bc) === sortedRows(win))
    assert(bc.filter($"r_rv".isNotNull).count() > 0)
  }

  test("broadcastAsOf forward and nearest equal the window directions") {
    for (dir <- Seq("forward", "nearest")) {
      val bc = AsOfJoin.broadcastAsOf(left, right, Seq("user_id"), "ts",
        Seq("rv"), direction = dir)
      val win = AsOfJoin.asOf(left, right, Seq("user_id"), "ts",
        Seq("rv"), None, dir)
      assert(sortedRows(bc) === sortedRows(win), s"direction=$dir")
    }
  }

  test("broadcastAsOf tolerance equals the window tolerance") {
    val bc = AsOfJoin.broadcastAsOf(left, right, Seq("user_id"), "ts",
      Seq("rv"), toleranceUs = Some(3600L * 1000000))
    val win = AsOfJoin.asOf(left, right, Seq("user_id"), "ts",
      Seq("rv"), Some(expr("INTERVAL 1 HOUR")))
    assert(sortedRows(bc) === sortedRows(win))
    // the tolerance must actually expire something, or this pins nothing
    val unbounded = AsOfJoin.broadcastAsOf(left, right, Seq("user_id"),
      "ts", Seq("rv"))
    assert(bc.filter($"r_rv".isNull).count() >
      unbounded.filter($"r_rv".isNull).count())
  }

  test("broadcastAsOf composite keys match the window multi-key form") {
    val l2 = ev.filter(pmod($"event_id", lit(2)) === 1)
      .select($"event_id", $"user_id", $"event_type", $"ts")
    val r2 = ev.filter(pmod($"event_id", lit(2)) === 0)
      .groupBy($"user_id", $"event_type", $"ts")
      .agg(max($"value").as("rv"))
    val bc = AsOfJoin.broadcastAsOf(l2, r2,
      Seq("user_id", "event_type"), "ts", Seq("rv"))
    val win = AsOfJoin.asOf(l2, r2, Seq("user_id", "event_type"), "ts",
      Seq("rv"), None)
    assert(sortedRows(bc) === sortedRows(win))
  }

  test("broadcastAsOf is map-only: no shuffle exchange, no window") {
    val bc = AsOfJoin.broadcastAsOf(left, right, Seq("user_id"), "ts",
      Seq("rv"))
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the fact (probe) side prints before the BroadcastExchange subtree;
    // the dim side is allowed its own prep shuffle (here the test
    // fixture's dedup aggregation) — what must never shuffle is the fact
    val factSide = plan.substring(0, plan.indexOf("BroadcastExchange"))
    assert(!factSide.contains("Exchange hashpartitioning"), factSide)
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("null keys and timestamps never match, in both implementations") {
    val l = Seq((1L, Option(5L), Option(100L)),
                (2L, None, Option(100L)),
                (3L, Option(5L), None))
      .toDF("id", "k", "t")
    val r = Seq((Option(5L), Option(90L), 1.0),
                (None.asInstanceOf[Option[Long]], Option(80L), 2.0),
                (Option(5L), None.asInstanceOf[Option[Long]], 3.0))
      .toDF("k", "t", "v")
    val bc = AsOfJoin.broadcastAsOf(l, r, Seq("k"), "t", Seq("v"))
      .orderBy($"id").collect()
    assert(bc.map(row => Option(row.get(3))).toSeq ===
      Seq(Some(1.0), None, None))
  }
}
