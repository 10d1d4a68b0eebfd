package graft.mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Dialect

/** SCD2 snapshots (reference materializations/snapshot.sql).
  *
  * The reference's own code is only the MERGE applier (snapshot.sql:13-34)
  * plus the row-identity hash (snapshot.sql:1-6); change *staging* comes
  * from dbt-core's timestamp strategy. Both halves are implemented here so
  * the operator is complete:
  *
  *  - [[stage]] — detect inserts/updates/deletes between the current
  *    snapshot and a fresh source read (dbt timestamp strategy: a row
  *    changed iff its `updated_at` advanced);
  *  - [[applyChanges]] — the reference MERGE on `dbt_scd_id`, rewritten as
  *    a distributed join (no MERGE INTO on vanilla parquet — SURVEY §7.3):
  *    matched ∧ dbt_valid_to IS NULL ∧ change ∈ (update, delete) → close
  *    the row; change = insert → add the row.
  *
  * Everything is a pure DataFrame rewrite: one shuffle on dbt_scd_id for
  * the apply, one on the unique key for staging.
  */
object Snapshot {

  val MetaColumns: Seq[String] =
    Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  /** snapshot.sql:1-6 — scd_id = md5 over '|'-joined coalesced args. */
  def scdId(keys: Seq[Column], updatedAt: Column): Column =
    Dialect.snapshotHash(keys :+ updatedAt)

  /** First-run snapshot: every source row becomes an open SCD2 row. */
  def initial(source: DataFrame, keys: Seq[String], updatedAt: String)
      : DataFrame = {
    val ua = col(updatedAt).cast("timestamp")
    source
      .withColumn("dbt_scd_id", scdId(keys.map(col), col(updatedAt)))
      .withColumn("dbt_updated_at", ua)
      .withColumn("dbt_valid_from", ua)
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
  }

  /** Stage changes between the open rows of `snapshot` and `source`
    * (dbt's timestamp strategy):
    *  - insert: key in source, not in snapshot-open;
    *  - update: key in both and source.updated_at > open-row.updated_at
    *    (staged twice, once as 'update' to close the old row and once as
    *    'insert' of the new version — dbt's insertions+updates CTEs);
    *  - delete: only when `invalidateHardDeletes`, key open in snapshot
    *    but gone from source (valid_to set to `now`).
    * Output schema: source columns + dbt meta columns + dbt_change_type.
    */
  def stage(
      snapshot: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updatedAt: String,
      invalidateHardDeletes: Boolean = false,
      now: Column = current_timestamp()): DataFrame = {
    // dbt requires the unique key to be unique in the source; a violation
    // here would close the open row against one twin while BOTH twins
    // insert as forever-open versions (two open rows per key — SCD2
    // corruption). The reference's Trino MERGE raises on the multi-match;
    // so do we, at execution time (Incremental.uniqueKeyGuard).
    val src0 = Incremental.uniqueKeyGuard(source, keys, "snapshot source")
    val ua = col(updatedAt).cast("timestamp")

    val open = snapshot.filter(col("dbt_valid_to").isNull)
      .select((keys.map(c => col(c)) :+
        col("dbt_updated_at").as("__snap_updated_at") :+
        col("dbt_scd_id").as("__snap_scd_id")): _*)

    val src = src0
      .withColumn("dbt_scd_id", scdId(keys.map(col), col(updatedAt)))
      .withColumn("dbt_updated_at", ua)
      .withColumn("dbt_valid_from", ua)
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))

    val joined = src.join(open, keys, "left_outer")

    // one pass over the join: each row explodes into its change rows
    // (insert: 1×'insert'; changed: 'insert' for the new version +
    // 'update' closing the old row — carrying ITS scd_id and valid_to
    // = the new updated_at; unchanged: none). The former three-branch
    // union re-executed the source⋈open join (and the unique-key
    // window guard under it) once per branch for the same row multiset
    // (r18, guide §1.2).
    val isInsert = col("__snap_scd_id").isNull
    val isChanged = col("__snap_scd_id").isNotNull &&
      col("dbt_updated_at") > col("__snap_updated_at")
    val base = joined
      .withColumn("dbt_change_type", explode(
        when(isInsert, array(lit("insert")))
          .when(isChanged, array(lit("insert"), lit("update")))
          .otherwise(array().cast("array<string>"))))
      .withColumn("dbt_scd_id",
        when(col("dbt_change_type") === "update", col("__snap_scd_id"))
          .otherwise(col("dbt_scd_id")))
      .withColumn("dbt_valid_to",
        when(col("dbt_change_type") === "update", col("dbt_updated_at"))
          .otherwise(col("dbt_valid_to")))
      .drop("__snap_updated_at", "__snap_scd_id")

    if (!invalidateHardDeletes) base
    else {
      val gone = snapshot.filter(col("dbt_valid_to").isNull)
        .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .withColumn("dbt_valid_to", now)
        .withColumn("dbt_change_type", lit("delete"))
      base.unionByName(gone.select(base.columns.map(col).toIndexedSeq: _*))
    }
  }

  /** First-run snapshot under the `check_cols` strategy: there is no
    * source `updated_at`, so validity starts at the snapshot time `now`
    * and the row identity hashes the keys plus `now`. */
  def initialCheck(source: DataFrame, keys: Seq[String],
                   now: Column): DataFrame =
    source
      .withColumn("dbt_scd_id", scdId(keys.map(col), now))
      .withColumn("dbt_updated_at", now.cast("timestamp"))
      .withColumn("dbt_valid_from", now.cast("timestamp"))
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))

  /** Stage changes under dbt's `check_cols` strategy: a row changed iff
    * ANY checked column differs null-safely (`<=>`) from the open
    * snapshot row. Versions are timestamped with the snapshot time `now`
    * (dbt's check strategy has no source updated_at). Output schema
    * matches [[stage]]. */
  def stageCheck(
      snapshot: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      checkCols: Seq[String],
      now: Column,
      invalidateHardDeletes: Boolean = false): DataFrame = {
    require(checkCols.nonEmpty, "check_cols strategy needs columns to check")
    val open = snapshot.filter(col("dbt_valid_to").isNull)
      .select((keys.map(col) ++
        checkCols.map(c => col(c).as(s"__snap_$c")) :+
        col("dbt_scd_id").as("__snap_scd_id")): _*)

    val src = Incremental
      .uniqueKeyGuard(source, keys, "snapshot source")
      .withColumn("dbt_scd_id", scdId(keys.map(col), now))
      .withColumn("dbt_updated_at", now.cast("timestamp"))
      .withColumn("dbt_valid_from", now.cast("timestamp"))
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))

    val joined = src.join(open, keys, "left_outer")
    val differs = checkCols.map(c => !(col(c) <=> col(s"__snap_$c")))
      .reduce(_ || _)

    // one pass over the join — the [[stage]] explode form (r18)
    val isInsert = col("__snap_scd_id").isNull
    val isChanged = col("__snap_scd_id").isNotNull && differs
    val dropCols = checkCols.map(c => s"__snap_$c") :+ "__snap_scd_id"
    val base = joined
      .withColumn("dbt_change_type", explode(
        when(isInsert, array(lit("insert")))
          .when(isChanged, array(lit("insert"), lit("update")))
          .otherwise(array().cast("array<string>"))))
      .withColumn("dbt_scd_id",
        when(col("dbt_change_type") === "update", col("__snap_scd_id"))
          .otherwise(col("dbt_scd_id")))
      .withColumn("dbt_valid_to",
        when(col("dbt_change_type") === "update", now.cast("timestamp"))
          .otherwise(col("dbt_valid_to")))
      .drop(dropCols: _*)

    if (!invalidateHardDeletes) base
    else {
      val gone = snapshot.filter(col("dbt_valid_to").isNull)
        .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .withColumn("dbt_valid_to", now.cast("timestamp"))
        .withColumn("dbt_change_type", lit("delete"))
      base.unionByName(gone.select(base.columns.map(col).toIndexedSeq: _*))
    }
  }

  /** Full `check_cols` snapshot step: stage + apply. */
  def runCheck(snapshot: DataFrame, source: DataFrame, keys: Seq[String],
               checkCols: Seq[String], now: Column,
               invalidateHardDeletes: Boolean = false): DataFrame =
    applyChanges(snapshot,
      stageCheck(snapshot, source, keys, checkCols, now,
        invalidateHardDeletes))

  /** snapshot.sql:13-34 — the MERGE applier:
    * {{{
    * MERGE INTO snapshot d USING staged s ON d.dbt_scd_id = s.dbt_scd_id
    * WHEN MATCHED AND d.dbt_valid_to IS NULL
    *      AND s.dbt_change_type IN ('update','delete')
    *   THEN UPDATE SET dbt_valid_to = s.dbt_valid_to
    * WHEN NOT MATCHED AND s.dbt_change_type = 'insert' THEN INSERT ...
    * }}}
    */
  def applyChanges(snapshot: DataFrame, staged: DataFrame): DataFrame = {
    val cols = snapshot.columns.toIndexedSeq
    val d = snapshot.alias("d")
    val closers = staged
      .filter(col("dbt_change_type").isin("update", "delete"))
      .select(col("dbt_scd_id").as("__scd"),
        col("dbt_valid_to").as("__new_valid_to"))
    val merged = d.join(closers, col("d.dbt_scd_id") === col("__scd"),
        "left_outer")
      .select(cols.map {
        case "dbt_valid_to" =>
          when(col("__scd").isNotNull && col("d.dbt_valid_to").isNull,
            col("__new_valid_to"))
            .otherwise(col("d.dbt_valid_to")).as("dbt_valid_to")
        case c => col(s"d.$c").as(c)
      }: _*)
    val inserts = staged.filter(col("dbt_change_type") === "insert")
      .alias("s")
      .join(d, col("s.dbt_scd_id") === col("d.dbt_scd_id"), "left_anti")
      .select(cols.map(col): _*)
    merged.unionByName(inserts)
  }

  /** Full snapshot step: stage + apply (what one `dbt snapshot` run does). */
  def run(snapshot: DataFrame, source: DataFrame, keys: Seq[String],
          updatedAt: String, invalidateHardDeletes: Boolean = false,
          now: Column = current_timestamp()): DataFrame =
    applyChanges(snapshot,
      stage(snapshot, source, keys, updatedAt, invalidateHardDeletes, now))
}
