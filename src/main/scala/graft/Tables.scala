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
    // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    // read nanos as long and convert (values are micros-exact in this data).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so spark.sql sees the same names
    * the DuckDB oracle uses. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
