package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming analytics over the `events` table (additive scope — the
  * reference is batch-only, SURVEY §2.5).
  *
  * The transform functions are written against plain DataFrames so the
  * SAME code runs in batch mode (oracle-checkable against DuckDB) and
  * under Structured Streaming (`readStream` → transform → `writeStream`):
  * `window()`/`session_window` are streaming-native operators that Spark
  * also evaluates in batch.
  */
object Events {

  /** Tumbling-window event counts + value sums per event_type.
    * Streaming: works with `withWatermark` upstream; state is one row per
    * (window, type) — bounded by watermark eviction. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window counts (1h window, 30m slide). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Per-user session aggregation with a gap timeout — the
    * `session_window` operator. In streaming this is the canonical
    * stateful sessionization; in batch Spark evaluates it with a
    * sort-within-group, and DuckDB oracles it with gaps-and-islands SQL. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"), col("sum_value"))

  /** JSON props extraction (events.props is a JSON string column). */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("k",
      get_json_object(col("props"), "$.k").cast(IntegerType))

  // -----------------------------------------------------------------
  // streaming entry points
  // -----------------------------------------------------------------

  /** File-source stream over a directory of event parquet files, with a
    * watermark for state eviction. The driver's event files carry
    * TIMESTAMP(NANOS), which vanilla Spark only reads as long — declared
    * long here and converted (values are micros-exact). */
  def readEventStream(spark: SparkSession, dir: String,
                      watermark: String = "1 hour"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", watermark)
  }

  /** Wire a windowed aggregation to a sink; Append mode emits each window
    * once its watermark passes (late data beyond the watermark dropped). */
  def startTumblingQuery(stream: DataFrame, checkpoint: String,
                         outPath: String): StreamingQuery =
    tumblingCounts(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()
}
