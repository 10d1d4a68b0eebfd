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
    // internal sort column: suffix until free, so a user column named
    // "__graft_z" (or anything else) can never be silently dropped
    val zc = Iterator.iterate("__graft_z")(_ + "_")
      .dropWhile(df.columns.contains).next()
    df.withColumn(zc, zValue(zcols.map(col), bits))
      .repartitionByRange(n, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  // -------------------------------------------------------------------
  // small-file compaction
  // -------------------------------------------------------------------

  /** Rewrite a parquet directory into ~`targetBytes` files. Streaming
    * sinks, over-parallel writers, and incremental appends all leave
    * small-file litter; at scale the per-file overhead (footer reads,
    * task scheduling, open/close) dominates scans long before data
    * volume does.
    *
    * Partition-aware: a directory-partitioned table (the layout
    * [[writePartitioned]] produces — `k=v` subdirectories, the #1
    * real-world source of small-file litter under streaming sinks) is
    * compacted LEAF BY LEAF — each partition directory is rewritten and
    * swapped independently, so the partition layout is preserved
    * (partition values live in the directory names, which never move)
    * and per-leaf work is bounded regardless of table size — the
    * scale-correct shape: a 100 TB table compacts as many small
    * independent jobs, resumable per partition. A flat directory is a
    * single leaf.
    *
    * Driver work is file LISTING only (metadata, model-sized); the data
    * moves through `coalesce`, which merges read splits WITHOUT a
    * shuffle — compaction is IO-bound, never exchange-bound. Each leaf
    * rewrite goes to a dot-prefixed hidden sibling (invisible to
    * Spark's file listing AND to partition discovery, so a crash can
    * never leave a directory that parses as a bogus partition value)
    * and is swapped in with two renames. NOTE the swap is not atomic:
    * HDFS-like filesystems have no atomic directory exchange, so
    * between the two renames there is a brief window (two metadata
    * ops) where that one leaf is absent — a concurrent reader can see
    * a transiently missing partition, never a partially-written one.
    * Readers needing stronger isolation should swap at the table-name
    * level ([[graft.mat.Materializer]]'s rename dance) or use a
    * snapshotting table format. Returns (filesBefore, filesAfter)
    * summed over leaves. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    // crash recovery FIRST (r12 sweep finding): the per-leaf swap is two
    // renames, and a crash between them leaves the leaf MISSING with its
    // only copy parked in a hidden `.X__precompact` sibling — hidden
    // dirs are invisible to Spark's listing AND to leafDataDirs, so
    // without this the partition silently vanished with no path back.
    // A flat table's hidden survivors live BESIDE the root (outside the
    // scanned tree), so the root recovers explicitly before the walk.
    recoverLeaf(fs, root)
    recoverTree(fs, root)
    val results = leafDataDirs(fs, root)
      .map(leaf => compactLeaf(spark, fs, leaf, targetBytes))
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /** Restore one leaf's crash-parked compaction state: a surviving
    * `.X__precompact` is the ORIGINAL data — renamed back when X is
    * missing (crash between the two swap renames), deleted when X
    * exists (crash after the swap, before cleanup). A surviving
    * `.X__compacting` tmp is always discarded (either partial, or a
    * completed rewrite superseded by restoring the original — the
    * re-run recompacts). */
  private def recoverLeaf(fs: org.apache.hadoop.fs.FileSystem,
                          leaf: org.apache.hadoop.fs.Path): Unit = {
    val parent = leaf.getParent
    if (parent == null) return
    val old = new org.apache.hadoop.fs.Path(parent,
      "." + leaf.getName + "__precompact")
    val tmp = new org.apache.hadoop.fs.Path(parent,
      "." + leaf.getName + "__compacting")
    if (fs.exists(old)) {
      if (!fs.exists(leaf))
        require(fs.rename(old, leaf),
          s"compact recovery: could not restore $leaf from $old")
      else fs.delete(old, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Walk the partition tree restoring crash-parked leaves — hidden
    * `__precompact`/`__compacting` entries are found by NAME in their
    * parent listing, because a mid-swap crash leaves no visible leaf to
    * enumerate. */
  private def recoverTree(fs: org.apache.hadoop.fs.FileSystem,
                          dir: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(dir)) return
    val entries = fs.listStatus(dir).toSeq.filter(_.isDirectory)
    entries.foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(".") && n.endsWith("__precompact"))
        recoverLeaf(fs, new org.apache.hadoop.fs.Path(dir,
          n.substring(1, n.length - "__precompact".length)))
      else if (n.startsWith(".") && n.endsWith("__compacting"))
        fs.delete(s.getPath, true)
    }
    entries.filter { s =>
      val n = s.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }.foreach(s => recoverTree(fs, s.getPath))
  }

  /** Leaf data directories under `dir`: directories with no visible
    * subdirectories (partition leaves, or the root itself for a flat
    * table). Hidden (`.`/`_`-prefixed) entries are skipped, mirroring
    * Spark's own listing rules. Stray files alongside partition
    * subdirectories are left untouched (Spark ignores them too). */
  private def leafDataDirs(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.Path] = {
    val subdirs = fs.listStatus(dir).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
    if (subdirs.isEmpty) Seq(dir)
    else subdirs.flatMap(d => leafDataDirs(fs, d.getPath))
  }

  private def compactLeaf(spark: SparkSession,
                          fs: org.apache.hadoop.fs.FileSystem,
                          leaf: org.apache.hadoop.fs.Path,
                          targetBytes: Long): (Int, Int) = {
    val dataFiles = fs.listStatus(leaf).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    if (dataFiles.isEmpty) return (0, 0)
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val parent = leaf.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent,
      "." + leaf.getName + "__compacting")
    val old = new org.apache.hadoop.fs.Path(parent,
      "." + leaf.getName + "__precompact")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(leaf.toString).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = fs.listStatus(tmp).count(s =>
      s.isFile && s.getPath.getName.startsWith("part-"))
    require(fs.rename(leaf, old), s"compact: could not stage $leaf")
    require(fs.rename(tmp, leaf), s"compact: could not swap in $tmp")
    fs.delete(old, true)
    (dataFiles.size, after)
  }
}
