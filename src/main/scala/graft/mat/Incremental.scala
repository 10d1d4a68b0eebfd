package graft.mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three incremental strategies (impl.py:80-81 →
  * ["append", "merge", "delete+insert"]), re-expressed as distributed
  * DataFrame rewrites (vanilla parquet has no DELETE/MERGE — SURVEY §7.3).
  *
  * All rewrites are pure plan constructions: no collect(), no driver-side
  * loops. Joins shuffle on the unique keys (or broadcast when Catalyst/AQE
  * finds a small side), so they scale horizontally.
  */
object Incremental {

  /** append (incremental.sql:145-149,198-204): insert staged rows as-is.
    * Column order follows the target (`dest_columns`), matching the
    * `insert into t (cols) select cols` shape. */
  def append(target: DataFrame, staged: DataFrame): DataFrame =
    target.unionByName(staged.select(target.columns.map(col).toIndexedSeq: _*))

  /** delete+insert (incremental.sql:112-150).
    *
    * Reference SQL shape, replicated exactly:
    * {{{
    * DELETE FROM target
    * WHERE (k1) IN (SELECT k1 FROM staged)
    *   AND (k2) IN (SELECT k2 FROM staged)   -- columnwise, NOT tuple-equality
    *   AND <incremental_predicates...>;
    * INSERT INTO target SELECT * FROM staged;
    * }}}
    *
    * Columnwise `IN` membership is computed with one left-outer join per key
    * against the staged key's distinct set, marking a membership flag; the
    * delete condition is the AND of all flags plus predicates. This keeps
    * SQL `IN` null semantics (NULL key → no match → row kept) and lets
    * AQE broadcast the (usually small) distinct key sets.
    *
    * Composite keys deliberately stay one join PER COLUMN (examined r4):
    * each column's membership check needs co-location by that column, so
    * any single-join rewrite either explodes target k× (unpivot+regroup:
    * three exchanges of the exploded relation), needs a row id
    * (monotonically_increasing_id across a self-referencing plan is the
    * classic nondeterminism trap unless the whole target is first
    * materialized), or joins flags back on the key tuple (a full distinct
    * of target keys — worse exactly when staged is small). In the
    * incremental norm — staged batch ≪ target — every distinct key set
    * broadcasts and the target never shuffles at all, which is already
    * the 100 TB plan shape.
    *
    * `predicates` are Column expressions over the target's columns
    * (incremental_predicates, incremental.sql:123-127).
    */
  def deleteInsert(
      target: DataFrame,
      staged: DataFrame,
      uniqueKeys: Seq[String],
      predicates: Seq[Column] = Nil): DataFrame = {
    require(uniqueKeys.nonEmpty,
      "delete+insert without unique_key degenerates to append")
    var t = target
    val flags = uniqueKeys.zipWithIndex.map { case (k, i) =>
      val flag = s"__graft_in_$i"
      val keySet = staged.select(col(k)).distinct()
        .withColumn(flag, lit(true))
      t = t.join(keySet, Seq(k), "left_outer")
      flag
    }
    val memberOfAll = flags.map(f => coalesce(col(f), lit(false)))
      .reduce(_ && _)
    val toDelete = predicates.foldLeft(memberOfAll)(_ && _)
    val kept = t.filter(!toDelete).drop(flags: _*)
      .select(target.columns.map(col).toIndexedSeq: _*)
    kept.unionByName(staged.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** merge (incremental.sql:152-205).
    *
    * Reference MERGE shape:
    * {{{
    * MERGE INTO target DBT_INTERNAL_DEST USING staged DBT_INTERNAL_SOURCE
    *   ON (dest.k1 = src.k1) AND (dest.k2 = src.k2) [AND predicates]
    * WHEN MATCHED THEN UPDATE SET <update_columns = src.update_columns>
    * WHEN NOT MATCHED THEN INSERT (<all dest_columns>) VALUES (...)
    * }}}
    *
    * `updateColumns`/`excludeColumns` honor merge_update_columns /
    * merge_exclude_columns subsetting (incremental.sql:156-158): when
    * `updateColumns` is empty, all non-key columns update, minus
    * `excludeColumns`.
    *
    * `predicates` are the `incremental_predicates` config
    * (incremental.sql:152-153): extra conjuncts AND-ed into the MERGE ON
    * condition. A target row whose key matches but fails a predicate is NOT
    * matched — it passes through unmodified — and its staged twin inserts
    * as a new row, exactly as SQL MERGE with a composite ON would do.
    * Predicates reference the two sides via the aliases `t` (target,
    * DBT_INTERNAL_DEST) and `s` (staged, DBT_INTERNAL_SOURCE).
    *
    * No unique key → degenerate insert (incremental.sql:198-204).
    *
    * Rewrite: matched rows = inner join taking update cols from staged and
    * the rest from target; unmatched target rows pass through (left_anti);
    * unmatched staged rows insert (left_anti the other way). One shuffle on
    * the keys serves all three branches.
    */
  def merge(
      target: DataFrame,
      staged: DataFrame,
      uniqueKeys: Seq[String],
      updateColumns: Seq[String] = Nil,
      excludeColumns: Seq[String] = Nil,
      predicates: Seq[Column] = Nil): DataFrame = {
    val cols = target.columns.toIndexedSeq
    val stagedAligned = staged.select(cols.map(col): _*)
    if (uniqueKeys.isEmpty)
      return append(target, stagedAligned)

    val updates: Seq[String] = {
      val base = if (updateColumns.nonEmpty) updateColumns
                 else cols.filterNot(uniqueKeys.contains)
      base.filterNot(excludeColumns.contains)
    }
    val tAlias = target.alias("t")
    val sAlias = stagedAligned.alias("s")
    val onCond = (uniqueKeys.map(k => col(s"t.$k") === col(s"s.$k")) ++
      predicates).reduce(_ && _)

    val matchedUpdated = tAlias.join(sAlias, onCond, "inner")
      .select(cols.map { c =>
        if (updates.contains(c)) col(s"s.$c").as(c) else col(s"t.$c").as(c)
      }: _*)
    val unmatchedTarget = tAlias.join(sAlias, onCond, "left_anti")
      .select(cols.map(col): _*)
    val inserted = sAlias.join(tAlias, onCond, "left_anti")
      .select(cols.map(col): _*)

    unmatchedTarget.unionByName(matchedUpdated).unionByName(inserted)
  }

  /** insert_overwrite — replace exactly the PARTITIONS present in the
    * staged batch, keep every other partition untouched. Not one of the
    * reference's three strategies (impl.py:80-81) but the standard
    * fourth strategy of partitioned-warehouse dbt adapters and the 100 TB
    * incremental shape: a daily batch touches yesterday's partition and
    * the rewrite cost is ONE partition, not a keyed join against the
    * whole target.
    *
    * Rewrite: anti-join the target against the staged batch's distinct
    * partition tuples (tuple semantics — a multi-column partition key
    * matches as a whole, unlike delete+insert's columnwise IN), then
    * union the batch. The distinct partition set is batch-sized, so AQE
    * broadcasts it and the target never shuffles. On a partitioned
    * parquet table the same result is a metadata-only dynamic partition
    * overwrite (`spark.sql.sources.partitionOverwriteMode=dynamic` +
    * `insertInto`); this logical form is what that write path computes,
    * and is what [[Materializer.incremental]] materializes. */
  def insertOverwrite(
      target: DataFrame,
      staged: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty,
      "insert_overwrite without partition columns would replace the whole table")
    val stagedAligned = staged.select(target.columns.map(col).toIndexedSeq: _*)
    val parts = stagedAligned.select(partitionCols.map(col): _*).distinct()
    target.join(parts, partitionCols, "left_anti")
      // USING-style joins move the join columns first; restore the
      // target's column order
      .select(target.columns.map(col).toIndexedSeq: _*)
      .unionByName(stagedAligned)
  }
}
