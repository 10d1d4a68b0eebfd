package graft.sources

import org.apache.spark.sql.DataFrame

/** Source/sink format surface beyond parquet (SURVEY §2.5 — the
  * reference delegates storage formats to Trino connectors; the Spark
  * twin is the built-in DataSource V2 formats). [[roundTrip]] drives a
  * frame through sink → scan of a format with an explicit schema on
  * re-read, which is how a typed pipeline consumes text formats (CSV and
  * JSON carry no schema of their own).
  *
  * Scale: both directions are distributed narrow jobs (one write task /
  * one scan split per partition); text formats trade scan speed and
  * pushdown for interchange — the engine's pushdown-audited hot path
  * stays parquet.
  */
object Formats {

  /** Write `df` as `format` under `path`, read it back with `df`'s
    * schema. Timestamps are written with microsecond precision so the
    * text round-trip is exact. */
  def roundTrip(df: DataFrame, format: String, path: String,
                options: Map[String, String] = Map.empty): DataFrame = {
    val opts = Map(
      "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
      "header" -> "true") ++ options
    df.write.mode("overwrite").format(format).options(opts).save(path)
    df.sparkSession.read.format(format).options(opts)
      .schema(df.schema).load(path)
  }

  /** Ingest a directory of raw files via Spark's `binaryFile` source —
    * the multimodal entry point: images/audio/any opaque payload arrive
    * as (path, modificationTime, length, content) rows, ready for the
    * [[graft.llm.Multimodal]] decode operators. `pathGlob` filters at
    * the LISTING level (pushed into the file index, not a post-scan
    * filter), so a mixed directory only lists matching files.
    *
    * Scale: listing is distributed for large directories and each file
    * becomes (at least) one task; the source never splits a file, so
    * per-file memory is bounded by the largest object — cap payload
    * size upstream, or store giant media in chunked parquet instead.
    * Caveat (LayoutSpec-pinned): zero-byte files produce NO row — the
    * file scan emits no split for an empty file. */
  def ingestBinaryDir(spark: org.apache.spark.sql.SparkSession,
                      dir: String, pathGlob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
}
