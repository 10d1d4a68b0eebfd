package graft.mat

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped rewrite machinery shared by the streaming upsert sink
  * ([[graft.streaming.Events.upsertBatch]]) and the incremental
  * materialization driver ([[Materializer.incremental]]) — the 100 TB
  * incremental shape on a partitioned vanilla-parquet table: per-run cost
  * tracks the partitions the staged batch touches, never the accumulated
  * table size.
  *
  * Three pieces, each metadata-sized on the driver:
  *  1. [[touchedPredicate]] — the staged batch's distinct partition tuples
  *     become literal, null-safe partition filters (static pruning: the
  *     target read never opens untouched partitions);
  *  2. the caller runs its keyed rewrite (merge / delete+insert) against
  *     the SCOPED target read;
  *  3. [[overwriteTouched]] — the scoped result is materialized to a tmp
  *     table (never overwrite partitions of a table from a plan that
  *     reads it), then committed via dynamic partition overwrite, which
  *     rewrites exactly the partitions present in the result — the
  *     touched set.
  *
  * CONTRACT (all scoped callers): a key's partition values must be stable
  * across versions — derive them from the key, not from mutable
  * attributes. A version arriving in a different partition than its
  * predecessor cannot see the old row: the scoped rewrite INSERTs it,
  * leaving the key duplicated across two partitions. This is the standard
  * constraint of partition-local upserts (the alternative is a global key
  * index, i.e. a different engine). The contract is verifiable after the
  * fact: [[verifyPartitionKeys]] detects keys that leaked across
  * partitions — run it offline as a data test on any scoped target.
  */
object PartitionScoped {

  /** Max distinct partition tuples one staged batch may touch before the
    * scoped path falls back to the full-table rewrite: the touched set is
    * collected to the driver (the same metadata dynamic partition
    * overwrite itself tracks per commit), so it must stay metadata-sized.
    * A batch touching more partitions than this is effectively a
    * full-table write anyway. */
  val MaxTouchedPartitions = 10000

  /** The staged batch's distinct partition tuples as one literal, null-safe
    * filter (`<=>` — a NULL partition value is a real partition and must
    * scope like any other). `None` when the batch touches more than
    * [[MaxTouchedPartitions]] partitions (caller falls back to the
    * full-table rewrite). The staged frame must be non-empty — an empty
    * batch has no touched set and the caller should no-op instead. */
  def touchedPredicate(staged: DataFrame,
                       partitionCols: Seq[String]): Option[Column] = {
    val parts: Array[Row] = staged.select(partitionCols.map(col): _*)
      .distinct().limit(MaxTouchedPartitions + 1).collect()
    require(parts.nonEmpty,
      "touchedPredicate on an empty staged batch — caller must no-op")
    if (parts.length > MaxTouchedPartitions) None
    else if (partitionCols.size == 1) {
      // single partition column — the common case: ONE In node instead
      // of a |touched|-term OR tree (a 10k-term OR is real Catalyst
      // analysis cost at the cap; In is one node and still statically
      // prunable). `IN` is null-VOIDING, not null-safe, so a NULL
      // partition value (a real partition) gets its own isNull disjunct.
      val c = col(partitionCols.head)
      val (nulls, vals) = parts.map(_.get(0)).partition(_ == null)
      val in = if (vals.nonEmpty) Some(c.isin(vals.toIndexedSeq: _*)) else None
      val nn = if (nulls.nonEmpty) Some(c.isNull) else None
      Some((in.toSeq ++ nn.toSeq).reduce(_ || _))
    } else Some(parts.map { r =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _))
  }

  /** Commit a scoped rewrite: materialize `result` to `tmpTable`, then
    * dynamic-partition-overwrite it into `table` (position-based
    * `insertInto`; the caller aligns columns to the target's physical
    * order, partition columns last). Only partitions PRESENT in the
    * result — exactly the touched set — are rewritten; every other
    * partition's files are untouched. The overwrite-mode conf is set for
    * the write and restored after. */
  def overwriteTouched(spark: SparkSession, table: String,
                       tmpTable: String, result: DataFrame,
                       dropTmpSql: String => Unit): Unit = {
    dropTmpSql(tmpTable)
    result.write.saveAsTable(tmpTable)
    dynamicOverwrite(spark) {
      spark.table(tmpTable).write.mode("overwrite").insertInto(table)
    }
    dropTmpSql(tmpTable)
  }

  /** `ALTER TABLE … RENAME TO …` + partition-metadata repair. The session
    * catalog's rename moves the data directory but DROPS a partitioned
    * table's partition metadata (probed: `SHOW PARTITIONS` comes back
    * empty and the table reads as 0 rows after a rename); `MSCK REPAIR`
    * re-registers the partitions from the filesystem, including NULL
    * partition values. No repair for unpartitioned tables. Every
    * tmp/backup swap and crash-recovery promotion must rename through
    * this, or a partitioned table silently empties on the swap. Names
    * are interpolated as given — callers quote if needed. */
  def renameTable(spark: SparkSession, from: String, to: String): Unit = {
    spark.sql(s"ALTER TABLE $from RENAME TO $to")
    // only the identifier-shaped failures may degrade to "no partition
    // columns" (a VIEW rename lands here — views have none); a transient
    // metadata error must propagate, or the MSCK repair the swap depends
    // on is silently skipped and the renamed table reads as 0 rows
    val partCols =
      try spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(to))
        .partitionColumnNames
      catch {
        case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException |
             _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException |
             _: org.apache.spark.sql.catalyst.parser.ParseException => Nil
      }
    if (partCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $to")
  }

  /** Partition-stability VERIFIER for the scoped-rewrite contract (see
    * the object scaladoc): returns the keys whose rows span MORE THAN
    * ONE partition tuple — exactly the rows a scoped rewrite can no
    * longer see together, i.e. silently duplicated keys. One
    * hash-partitioned groupBy on the keys with a distinct-count of the
    * partition tuple — O(|table|) once, runnable offline as a data
    * test (the violation is otherwise undetectable short of a manual
    * query). Null-keyed rows are excluded: the scoped writers drop
    * them, so they carry no upsert identity. Output: the key columns +
    * `n_partitions` (only rows with n_partitions > 1); an empty result
    * means the contract holds. */
  def verifyPartitionKeys(df: DataFrame, keys: Seq[String],
                          partitionCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "verifyPartitionKeys needs key columns")
    require(partitionCols.nonEmpty,
      "verifyPartitionKeys needs partition columns")
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(countDistinct(struct(partitionCols.map(col): _*))
        .as("n_partitions"))
      .filter(col("n_partitions") > 1)
  }

  /** [[verifyPartitionKeys]] against a catalog table, partition columns
    * taken from the table's own metadata. */
  def verifyPartitionKeys(spark: SparkSession, table: String,
                          keys: Seq[String]): DataFrame = {
    val partCols = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
      .partitionColumnNames
    require(partCols.nonEmpty, s"$table is not partitioned")
    verifyPartitionKeys(spark.table(table), keys, partCols)
  }

  /** Run `body` with `partitionOverwriteMode=dynamic` (overwrite replaces
    * only the partitions PRESENT in the written frame), restoring the
    * previous conf value after. */
  def dynamicOverwrite(spark: SparkSession)(body: => Unit): Unit = {
    val overwriteMode = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(overwriteMode)
    spark.conf.set(overwriteMode, "dynamic")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(overwriteMode, v)
        case None => spark.conf.unset(overwriteMode)
      }
    }
  }
}
