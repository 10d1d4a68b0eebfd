package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so spark.sql sees the same names
    * the DuckDB oracle uses. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
