package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Group-wise winsorization: clip a numeric column at per-group exact
  * quantiles [lo, hi] — the standard heavy-tail guard before averaging
  * or regression over per-domain metrics (doc lengths, prices, session
  * durations), where a few crawler artifacts would otherwise own the
  * mean.
  *
  * Shape at scale: ONE groupBy computes both exact percentiles per
  * group (Spark's sort-based percentile aggregate, partial-aggregated
  * map-side), the per-group pair table is model-sized (groups =
  * domains/sources, not rows) and broadcasts back onto the fact side —
  * the clip itself is then a map-only projection; the fact table is
  * never shuffled. `broadcastThresholdGroups` guards the hint: past it
  * the join falls back to Spark's own strategy choice (a sort-merge on
  * the group key) rather than broadcasting an oversized build side.
  *
  * Clipped output is `<value>_w` (double, rounded to 6 for
  * engine-portable comparison); original columns pass through. */
object Winsorize {

  def winsorize(df: DataFrame, keys: Seq[String], value: String,
                lo: Double, hi: Double,
                broadcastThresholdGroups: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one group key")
    require(0.0 <= lo && lo <= hi && hi <= 1.0,
      s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val q = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($value, $lo)").as("__plo"),
        expr(s"percentile($value, $hi)").as("__phi"))
    val nGroups = q.count()
    val dim = if (nGroups <= broadcastThresholdGroups) broadcast(q) else q
    df.join(dim, keys)
      .withColumn(s"${value}_w",
        round(when(col(value) < col("__plo"), col("__plo"))
          .when(col(value) > col("__phi"), col("__phi"))
          .otherwise(col(value).cast(DoubleType)), 6))
      .drop("__plo", "__phi")
  }
}
