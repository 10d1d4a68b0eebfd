package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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
  // custom state: KeyValueGroupedDataset.flatMapGroupsWithState
  // -----------------------------------------------------------------

  final case class Ev(event_id: Long, ts_us: Long, user_id: Long,
                      value: Double)
  final case class SessU(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Long, sum_value: Double)
  final case class SessAcc(start: Long, last: Long, n: Long, sum: Double)

  /** Per-user sessionization via the CUSTOM-STATE API
    * (`flatMapGroupsWithState`) instead of the built-in
    * `session_window` — the extension point for session logic the
    * built-in can't express (e.g. value-dependent gaps, early emission).
    *
    * Event times flow as MICROSECONDS (unix_micros) so boundaries match
    * session_window exactly; session windows are end-exclusive — an
    * event arriving exactly `gap` after the last one starts a NEW
    * session, as session_window's interval-overlap merge does.
    *
    * Batch evaluation receives each user's full event iterator and is
    * exact (parity-tested against [[sessions]]). Under streaming the
    * same function runs incrementally per micro-batch with `GroupState`
    * carrying the open session and event-time timeouts closing it; state
    * per key is one [[SessAcc]] — bounded. */
  def sessionsCustomState(events: DataFrame,
                          gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessAcc, SessU](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessAcc]) =>
          val evs = it.toArray.sortBy(_.ts_us)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessAcc]
          var cur = state.getOption.orNull
          for (e <- evs) {
            val t = e.ts_us
            if (cur == null) cur = SessAcc(t, t, 1, e.value)
            else if (t - cur.last >= gapUs) { // end-exclusive window
              out += cur
              cur = SessAcc(t, t, 1, e.value)
            } else cur = SessAcc(cur.start, t, cur.n + 1, cur.sum + e.value)
          }
          // batch: everything seen → emit the trailing session too.
          // streaming would instead state.update(cur) + setTimeoutTimestamp
          // and emit it on timeout; batch state never persists.
          if (cur != null) out += cur
          out.iterator.map(a =>
            SessU(uid, a.start, a.last + gapUs, a.n, a.sum))
      }
      .toDF()
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("sess_start"),
        timestamp_micros(col("end_us")).as("sess_end"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming exact-dedup on event_id — the streaming twin of
    * Dedup.exact: seen-key state is evicted once older than the
    * watermark (`dropDuplicatesWithinWatermark`), so state stays
    * bounded on an unbounded stream. */
  def dedupedStream(stream: DataFrame): DataFrame =
    stream.dropDuplicatesWithinWatermark("event_id")

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

  /** Streaming dedup → parquet sink (AvailableNow drains what's there). */
  def startDedupQuery(stream: DataFrame, checkpoint: String,
                      outPath: String): StreamingQuery =
    dedupedStream(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()
}
