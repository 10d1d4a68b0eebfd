package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-event TRAILING time-range aggregates — "this user's activity in
  * the 7 days ending at this event": each row is annotated with
  * count / sum / avg / min / max of a value over the half-open-by-time
  * window [ts − horizon, ts], per key. This is the feature-engineering
  * primitive behind rate limits, burst detection, and recency features;
  * it differs from `Events.slidingCounts` (bucketed counts per fixed
  * grid window) in that the frame ends at EVERY event, not on a grid.
  *
  * One exchange on the key + one sort per partition; the range frame is
  * evaluated by Spark's sliding Window frame processor in a single
  * pass (two pointers over the sorted run — O(n) amortized per key,
  * never the O(n·w) re-scan a self-join BETWEEN formulation costs, and
  * never the full-key-history state an unbounded frame needs). The sum
  * rides DECIMAL so reassociation under the moving frame is exact and
  * the oracle comparison cannot drift; avg = sum/count evaluated at
  * full decimal then cast.
  *
  * At 100 TB: partitions are per-key (events tables key by user/host —
  * high cardinality), the frame bound keeps window state O(events in
  * horizon), and AQE handles residual key skew. Rows within one key at
  * the SAME timestamp share a frame (RANGE semantics — all peers
  * included), which keeps the result deterministic under duplicate
  * timestamps. */
object Rolling {

  def trailing(df: DataFrame, key: String, ts: String, value: String,
               horizonSec: Long): DataFrame = {
    require(horizonSec > 0, s"horizonSec must be positive: $horizonSec")
    val sec = unix_timestamp(col(ts))
    val w = Window.partitionBy(col(key)).orderBy(sec)
      .rangeBetween(-horizonSec, Window.currentRow)
    val decv: Column = col(value).cast(DecimalType(18, 2))
    df.select(col("*"),
      count(lit(1)).over(w).as("roll_n"),
      sum(decv).over(w).cast(DoubleType).as("roll_sum"),
      // avg as DOUBLE-division of the exact decimal sum: decimal
      // division rounds at engine-specific result scales, double
      // division of identical inputs is bit-identical everywhere
      (sum(decv).over(w).cast(DoubleType) / count(lit(1)).over(w))
        .as("roll_avg"),
      min(decv).over(w).cast(DoubleType).as("roll_min"),
      max(decv).over(w).cast(DoubleType).as("roll_max"))
  }
}
