package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference adapter's "sources" are federated Trino catalogs named in
  * the dbt profile (reference README.md:20-28); here the source surface is
  * the Spark DataFrameReader over the driver's parquet star schema.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver has regenerated events.parquet across rounds with three
    // different physical timestamp encodings: TIMESTAMP(NANOS) (which
    // vanilla Spark rejects — read as long), timezone-aware micros, and
    // timezone-less micros (TIMESTAMP_NTZ). Normalize all three to
    // TimestampType here, in the one loader every query shares: the
    // session timezone is pinned UTC (Bench/Verify/specs), so the
    // NTZ→TZ cast preserves the instant and the DuckDB oracle (NTZ-
    // native) keeps matching.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else {
      val ntz = df.schema.fields.collect {
        case f if f.dataType == TimestampNTZType => f.name
      }
      ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
    }
  }

  /** Register every table as a temp view so spark.sql sees the same names
    * the DuckDB oracle uses. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
