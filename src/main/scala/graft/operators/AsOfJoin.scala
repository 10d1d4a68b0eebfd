package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the latest right row
  * with `rightTs <= leftTs` in the same key group. The operator Spark
  * lacks natively (DuckDB spells it `ASOF JOIN`, the oracle twin), and
  * the backbone of feature/label alignment in training-data pipelines.
  *
  * Implementation (composition of built-ins, SURVEY §7.5 preference (a)):
  * tag and union both sides, then ONE window pass per key group ordered
  * by (ts, side) carries the last-seen right payload forward onto left
  * rows. Cost = one shuffle on the keys + a sort within partitions —
  * never the naive range cross-join (which is quadratic per key), and
  * no per-row probe structure. At 100 TB both sides shuffle once;
  * skewed keys fall under AQE like any window.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so a right row
  * at exactly `ts` matches (the `<=` of ASOF). The right side must be
  * unique per (keys, ts) — pre-aggregate duplicates (the window would
  * otherwise pick the partition-order-dependent last one).
  */
object AsOfJoin {

  /** Single-key form — see the multi-key overload. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightValueCols: Seq[String],
           tolerance: Option[Column] = None,
           direction: String = "backward"): DataFrame =
    asOf(left, right, Seq(key), ts, rightValueCols, tolerance, direction)

  /** Multi-key form without direction (source compatibility). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           ts: String, rightValueCols: Seq[String],
           tolerance: Option[Column]): DataFrame =
    asOf(left, right, keys, ts, rightValueCols, tolerance, "backward")

  /** Composite-key as-of join (DuckDB ASOF takes any number of equality
    * conditions plus one inequality; same here — the window partitions
    * by the full key tuple).
    *
    * `tolerance`: maximum lookback — a carried right row older than
    * `leftTs - tolerance` does NOT match (pandas `merge_asof(tolerance=)`
    * / kdb `wj` window semantics). Any expression subtractable from the
    * ts column: an `expr("INTERVAL 1 HOUR")` for timestamps, a plain
    * number for numeric ts. Evaluated inside the same single window
    * pass — no extra shuffle: the carried struct keeps the right row's
    * own timestamp, and the last-at-or-before row either satisfies the
    * window or nothing earlier can. */
  /** Full form with `direction` (pandas merge_asof parity):
    *  - "backward" (default): latest right row with rightTs <= leftTs;
    *  - "forward": earliest right row with rightTs >= leftTs;
    *  - "nearest": whichever of the two is closer in time, ties to the
    *    backward row. `tolerance` bounds the search on the matching
    *    side(s) — lookback for backward, lookahead for forward, both
    *    for nearest.
    * Forward/nearest use VALUE-based range frames over the same
    * tagged-union shape (one shuffle on the keys, one sort; nearest's
    * two window frames share the exchange and sort since partitioning
    * and ordering are identical), so a right row at exactly leftTs
    * matches in every direction. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           ts: String, rightValueCols: Seq[String],
           tolerance: Option[Column], direction: String): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    require(rightValueCols.nonEmpty, "as-of join needs right value columns")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction '$direction'")
    if (direction != "backward")
      return asOfDirectional(left, right, keys, ts, rightValueCols,
        tolerance, direction)
    val leftCols = left.columns.toIndexedSeq
    val rvType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        right.schema(ts).dataType) +:
        rightValueCols.map(c => right.schema(c)))
    def keysNotNull = keys.map(k => col(k).isNotNull).reduce(_ && _)

    // a right row with a NULL key or NULL timestamp can never be an ASOF
    // match, but if it entered the union it would sort nulls-first inside
    // a valid key partition and its payload would be carried onto left
    // rows that have no earlier valid right match — drop such rows up
    // front (the left-side mask below handles null LEFT rows)
    val rUnion = right
      .filter(keysNotNull && col(ts).isNotNull)
      .select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ struct(col(ts).as("__rts") +: rightValueCols.map(col): _*)
        .cast(rvType).as("__rv")
        :+ lit(0).as("__side")): _*)
    val lUnion = left.select(
      (leftCols.map(col) :+ lit(null).cast(rvType).as("__rv")
        :+ lit(1).as("__side")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ASOF never matches on NULL keys or NULL timestamps (the window
    // would otherwise group null keys together and carry right-side
    // values onto null-key left rows, where SQL join semantics say no
    // match) — mask the carried payload for those rows
    // tolerance: the carried row is the LATEST right row at-or-before
    // this ts; if even it falls outside the lookback window, no earlier
    // row can be inside it → correctly null
    val carriedOk = tolerance match {
      case Some(tol) =>
        col("__carried").isNotNull &&
          col("__carried").getField("__rts") >= col(ts) - tol
      case None => lit(true)
    }
    lUnion.unionByName(rUnion)
      .withColumn("__carried",
        when(keysNotNull && col(ts).isNotNull,
          last(col("__rv"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightValueCols.map(c =>
        when(carriedOk, col("__carried").getField(c)).as(s"r_$c"))): _*)
  }

  /** Broadcast as-of join — the ZERO-shuffle sibling of [[asOf]] for
    * the small-right-side case (a dimension that fits on the driver,
    * like any broadcast join side). The window form shuffles BOTH
    * sides on the keys; when the right side is a rates/config/sensor
    * dimension of a few million rows joined against a 100 TB fact,
    * that shuffle of the fact table is the whole cost. Here:
    *
    *  1. the right side's (key → sorted ts[]) index is collected and
    *     BROADCAST once (torrent, per executor — not per task);
    *  2. a map-only codegen expression ([[graft.functions.AsOfMatchTs]])
    *     binary-searches it to stamp each left row with the MATCHED
    *     right timestamp (direction + tolerance resolved right there);
    *  3. an ordinary broadcast hash equi-join on (keys, matched ts)
    *     fetches the value columns — arbitrary arity and types, all
    *     whole-stage codegen, zero exchanges on the fact side
    *     (plan-asserted in AsOfJoinSpec).
    *
    * Same contract as [[asOf]]: inclusive match, right unique per
    * (keys, ts), NULL keys/ts never match, output = left.* plus
    * `r_`-prefixed value columns. `toleranceUs` is epoch MICROS for
    * timestamp ts (micros are the equi-join domain); for integral ts
    * columns it is in the column's own units. */
  def broadcastAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
                    ts: String, rightValueCols: Seq[String],
                    toleranceUs: Option[Long] = None,
                    direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    require(rightValueCols.nonEmpty, "as-of join needs right value columns")
    val dirCode = Map("backward" -> 0, "forward" -> 1, "nearest" -> 2)
      .getOrElse(direction,
        throw new IllegalArgumentException(
          s"unknown as-of direction '$direction'"))
    val RtsCol = "__graft_asof_rts"
    require(!(left.columns ++ right.columns).contains(RtsCol),
      s"column name $RtsCol is reserved by broadcastAsOf")

    def tsUs(df: DataFrame): Column = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(ts))
      // NTZ: the driver's parquet is timezone-less; sessions are pinned
      // UTC, so the cast preserves the instant
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(ts).cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        col(ts).cast("long")
      case other => throw new IllegalArgumentException(
        s"broadcastAsOf needs a timestamp or integral ts column, " +
          s"got ${other.sql}")
    }
    def keysNotNull = keys.map(k => col(k).isNotNull).reduce(_ && _)
    // composite key as one string: concat_ws SKIPS nulls (would alias
    // ("a", null) with ("a")), so the mask forces whole-key null first
    def ckey: Column = when(keysNotNull,
      concat_ws("\u0000", keys.map(col(_).cast("string")): _*))

    // driver-side index build — this is the eager, collect-the-dim step
    // every broadcast join has; the fact side is never touched
    val spark = left.sparkSession
    import spark.implicits._
    val idx = new java.util.HashMap[String, Array[Long]]()
    right.filter(keysNotNull && col(ts).isNotNull)
      .select(ckey.as("k"), tsUs(right).as("t"))
      .as[(String, Long)].collect()
      .groupBy(_._1)
      .foreach { case (k, vs) => idx.put(k, vs.map(_._2).sorted) }
    val bc = spark.sparkContext.broadcast(idx)

    val matchTs = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.AsOfMatchTs(
        org.apache.spark.sql.GraftColumnBridge.expression(ckey),
        org.apache.spark.sql.GraftColumnBridge.expression(tsUs(left)),
        bc, dirCode, toleranceUs.getOrElse(-1L)))

    val l = left.withColumn(RtsCol, matchTs)
    val r = right.filter(keysNotNull && col(ts).isNotNull)
      .select((keys.map(col) :+ tsUs(right).as(RtsCol)) ++
        rightValueCols.map(c => col(c).as(s"r_$c")): _*)
    // the using-join reorders columns (join keys first) — restore
    // left.* ++ r_* to match asOf's output shape exactly
    l.join(broadcast(r), keys :+ RtsCol, "left_outer")
      .select(left.columns.map(col).toIndexedSeq ++
        rightValueCols.map(c => col(s"r_$c")): _*)
  }

  /** forward / nearest directions. Same tagged-union single-shuffle
    * shape as backward; the frames are RANGE (value-based) over the
    * bare ts ordering, so same-ts right rows are frame peers and match
    * in both directions without the side-ordering trick. */
  private def asOfDirectional(left: DataFrame, right: DataFrame,
                              keys: Seq[String], ts: String,
                              rightValueCols: Seq[String],
                              tolerance: Option[Column],
                              direction: String): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val rvType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        right.schema(ts).dataType) +:
        rightValueCols.map(c => right.schema(c)))
    def keysNotNull = keys.map(k => col(k).isNotNull).reduce(_ && _)
    val rUnion = right
      .filter(keysNotNull && col(ts).isNotNull)
      .select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ struct(col(ts).as("__rts") +: rightValueCols.map(col): _*)
        .cast(rvType).as("__rv")
        :+ lit(0).as("__side")): _*)
    val lUnion = left.select(
      (leftCols.map(col) :+ lit(null).cast(rvType).as("__rv")
        :+ lit(1).as("__side")): _*)

    val wBack = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward lookup runs over the REVERSED ts order as a running
    // frame: "earliest at-or-after" == "latest at-or-before" in desc
    // order, with RANGE keeping same-ts rows frame peers. A
    // currentRow..unboundedFollowing frame would re-aggregate the
    // partition tail per row — Spark's lower-bounded frame processor is
    // O(n²) per key (measured 92 s vs 0.6 s on the sf0.1 gap-fill
    // interpolate row, same shape) — while the reversed running frame
    // is the O(n) accumulator. Both windows partition identically: ONE
    // exchange, two in-partition sorts.
    val wFwdRev = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val validLeft = keysNotNull && col(ts).isNotNull

    val u0 = lUnion.unionByName(rUnion)
    val u = direction match {
      case "forward" =>
        u0.withColumn("__cf",
          when(validLeft, last(col("__rv"), ignoreNulls = true).over(wFwdRev)))
      case _ => // nearest: backward + forward, one exchange
        u0.withColumn("__cb",
            when(validLeft, last(col("__rv"), ignoreNulls = true).over(wBack)))
          .withColumn("__cf",
            when(validLeft, last(col("__rv"), ignoreNulls = true).over(wFwdRev)))
    }
    def rts(c: Column): Column = c.getField("__rts")
    val fwdOk = col("__cf").isNotNull && (tolerance match {
      case Some(tol) => rts(col("__cf")) <= col(ts) + tol
      case None => lit(true)
    })
    val chosen = direction match {
      case "forward" => when(fwdOk, col("__cf"))
      case _ =>
        val backOk = col("__cb").isNotNull && (tolerance match {
          case Some(tol) => rts(col("__cb")) >= col(ts) - tol
          case None => lit(true)
        })
        // ties (equal distance) resolve to the backward row
        when(backOk && fwdOk,
            when(col(ts) - rts(col("__cb")) <= rts(col("__cf")) - col(ts),
              col("__cb")).otherwise(col("__cf")))
          .when(backOk, col("__cb"))
          .when(fwdOk, col("__cf"))
    }
    u.filter(col("__side") === 1)
      .withColumn("__chosen", chosen)
      .select((leftCols.map(col) ++ rightValueCols.map(c =>
        col("__chosen").getField(c).as(s"r_$c"))): _*)
  }
}
