package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-weighted average over irregularly spaced observations: each
  * value is weighted by how long it remained the latest observation
  * (carry-forward weighting, the TWAP of market data and the correct
  * mean for any sampled-on-change signal — an unweighted avg
  * over-counts chatty periods). The last observation per key carries no
  * weight (nothing after it to bound the interval); single-observation
  * keys therefore produce no row, by contract.
  *
  * Exactness across engines: intervals are integer MICROSECONDS
  * (`unix_micros` here, `epoch_us` in the oracle — second-level epochs
  * would truncate on one engine and round on the other for sub-second
  * timestamps), and the weighted sum is decimal×long — exact and
  * summation-order-independent — cast to double only for the final
  * division. `tieBreak` columns are required so equal-timestamp
  * observations order identically everywhere.
  *
  * Shape at scale: one shuffle on the key for the lead() window, then a
  * map-side-combined groupBy on the same key — AQE reuses the
  * partitioning, so the agg is exchange-free. State per row is one
  * lead value; nothing buffers a key's history.
  */
object TimeWeighted {

  /** `value` should be an exact (decimal) column — cast before calling;
    * doubles would make the weighted sum order-dependent. */
  def twap(df: DataFrame, keys: Seq[String], ts: String, value: Column,
           tieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "twap requires at least one key column")
    require(tieBreak.nonEmpty,
      "tieBreak columns are required: equal timestamps would make " +
        "interval attribution nondeterministic")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    // NTZ is cast to TimestampType (UTC session → same instant); any
    // other non-timestamp type still fails analysis LOUDLY — a blanket
    // cast would reinterpret an integer epoch-micros column as SECONDS
    val us = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(ts).cast("timestamp"))
      case _ => unix_micros(col(ts))
    }
    df.withColumn("__graft_dt", lead(us, 1).over(w) - us)
      .filter(col("__graft_dt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg((count(lit(1)) + 1).as("n_events"),
        sum(col("__graft_dt")).as("total_us"),
        // round(6): the weighted sum's unscaled value exceeds 2^53, and
        // decimal→double conversion is correctly rounded here but
        // double-rounded in some engines — a last-ulp seam the fixed
        // rounding absorbs
        round(sum(value * col("__graft_dt")).cast(DoubleType) /
          sum(col("__graft_dt")), 6).as("twap"))
  }
}
