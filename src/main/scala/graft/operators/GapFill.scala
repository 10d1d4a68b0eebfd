package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key series to
  * a fixed grid with carry-forward fill — the feature-engineering
  * staple (sensor/price/metric series in, model-ready equal-spaced
  * series out). Complements [[AsOfJoin]]: as-of joins align one
  * irregular series to ANOTHER's timestamps; gap-fill aligns it to a
  * synthetic grid.
  *
  * Semantics per key: one row per `stepSec` tick from the key's first
  * observed tick through its last; each tick carries the LATEST
  * observation at-or-before it (ties inside a tick broken by
  * (timestamp, tieBreak) descending — deterministic under duplicate
  * timestamps). Ticks before a key's first observation don't exist
  * (nothing to carry), so `filled` is never null.
  *
  * Scale shape: one shuffle keys the per-tick pick + bounds aggregate;
  * the spine explode is map-side (sequence per key — span/stepSec
  * ticks, generated not stored); the carry-forward is a running
  * `last(ignoreNulls)` over (key, tick) — rows-frame, no global
  * window. Spine size is the OUTPUT size; nothing quadratic exists.
  */
object GapFill {

  def gapFill(df: DataFrame, key: String, ts: String, tieBreak: String,
              value: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val tick = timestamp_seconds(
      floor(unix_timestamp(col(ts)) / stepSec) * stepSec)
    // latest observation within each (key, tick)
    val wPick = Window.partitionBy(col("key"), col("tick"))
      .orderBy(col("__ts").desc, col("__tb").desc)
    val picked = df.select(col(key).as("key"), tick.as("tick"),
        col(ts).as("__ts"), col(tieBreak).as("__tb"),
        col(value).as("__v"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("key"), col("tick"), col("__v"))
    val spine = picked.groupBy("key")
      .agg(min(col("tick")).as("mn"), max(col("tick")).as("mx"))
      .select(col("key"), explode(
        sequence(col("mn"), col("mx"),
          expr(s"INTERVAL $stepSec SECONDS"))).as("tick"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(picked, Seq("key", "tick"), "left_outer")
      .select(col("key"), col("tick"),
        last(col("__v"), ignoreNulls = true).over(wFill).as("filled"),
        col("__v").isNotNull.as("observed"))
  }
}
