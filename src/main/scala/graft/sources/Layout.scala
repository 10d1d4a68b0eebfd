package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB table design.
  *
  * At cluster scale the dominant cost of the big fact-table joins and
  * repeated probes is the shuffle; these writers pre-pay it once at
  * load time:
  *
  *  - [[writeBucketed]] — hash-bucket (and sort) by the join keys.
  *    Tables bucketed the same way equi-join with NO shuffle on either
  *    side (SortMergeJoin reads co-located buckets directly); asserted
  *    at the plan level in LayoutSpec.
  *  - [[writePartitioned]] — directory-partition by a low-cardinality
  *    column; filters on it prune whole directories before any IO
  *    (partition pruning — e.g. the IVF `cell` column, so an ANN probe
  *    reads |probed cells|/nlist of the corpus).
  */
object Layout {

  /** Bucketed+sorted table write: `buckets` hash buckets on `keys`.
    * Equi-joins between same-bucketed tables skip the shuffle; the
    * sort makes SortMergeJoin skip its sort too. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Directory-partitioned table write (partition pruning on reads). */
  def writePartitioned(df: DataFrame, table: String,
                       partCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .format("parquet")
      .saveAsTable(table)

  // -------------------------------------------------------------------
  // Z-order clustering (multi-column data skipping)
  // -------------------------------------------------------------------

  /** Morton (Z-order) value of `cols`: the low `bits` bits of each
    * column, bit-interleaved (bit i of column j lands at position
    * i·|cols| + j). Rows close in Z-value are close in EVERY input
    * dimension, so sorting by it gives parquet row groups tight min/max
    * ranges on all the interleaved columns at once — a single-column
    * sort only ever serves filters on that column. Pure 64-bit shift/
    * mask arithmetic (|cols|·bits codegen terms, no UDF); inputs are
    * masked to `bits` (callers with wider domains should range-bucket
    * first — skipping only needs rank locality, not exact values).
    * |cols|·bits must stay ≤ 62 to keep the value positive in a LONG. */
  def zValue(cols: Seq[Column], bits: Int = 8): Column = {
    val c = cols.length
    require(c >= 1 && c * bits <= 62,
      s"zValue: ${c} cols x $bits bits exceeds the 62-bit budget")
    val terms = for {
      j <- cols.indices
      i <- 0 until bits
    } yield shiftleft(
      shiftright(pmod(cols(j).cast("long"), lit(1L << bits)), i)
        .bitwiseAND(lit(1L)),
      i * c + j)
    terms.reduce(_ + _)
  }

  /** Z-order-clustered parquet write: range-partition then sort by the
    * interleaved value, so every output file covers a compact
    * hyper-rectangle of the `zcols` space and min/max row-group stats
    * prune multi-dimension box filters. One shuffle (the range
    * exchange) paid once at layout time; every subsequent selective
    * scan reads only the files whose stats intersect the predicate —
    * at 100 TB the difference between a full scan and a few files.
    * `repartitionByRange` samples the z-distribution, so skew in the
    * raw columns does not skew file sizes. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
                    bits: Int = 8, partitions: Int = 0): Unit = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", zValue(zcols.map(col), bits))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  // -------------------------------------------------------------------
  // small-file compaction
  // -------------------------------------------------------------------

  /** Rewrite a parquet directory into ~`targetBytes` files. Streaming
    * sinks, over-parallel writers, and incremental appends all leave
    * small-file litter; at scale the per-file overhead (footer reads,
    * task scheduling, open/close) dominates scans long before data
    * volume does. Driver work is file LISTING only (metadata,
    * model-sized); the data moves through `coalesce`, which merges
    * read splits WITHOUT a shuffle — compaction is IO-bound, never
    * exchange-bound. The rewrite goes to a sibling directory and is
    * swapped in with two renames (the table-swap idiom from
    * [[graft.mat.Materializer]]), so readers never observe a partial
    * directory. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val dataFiles = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = fs.listStatus(tmp).count(s =>
      s.isFile && s.getPath.getName.startsWith("part-"))
    require(fs.rename(p, old), s"compact: could not stage $path")
    require(fs.rename(tmp, p), s"compact: could not swap in $tmp")
    fs.delete(old, true)
    (dataFiles.size, after)
  }
}
