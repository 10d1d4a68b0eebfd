package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data capture between two table versions): given
  * yesterday's and today's copy of a keyed table, emit one row per key
  * whose state changed — `added` (key only in the new snapshot),
  * `removed` (only in the old), or `changed` (present in both with at
  * least one non-key column differing, null-safely) together with the
  * comma-joined sorted list of the columns that differ. Unchanged keys —
  * the overwhelming majority of any real snapshot pair — produce no
  * output. This is the audit/replication primitive the reference's
  * snapshot materialization consumes implicitly (dbt-extrica
  * `snapshot.sql` detects changed rows to close SCD2 intervals); here it
  * is a standalone operator so pipelines can diff arbitrary versions.
  *
  * Shape at scale: one shuffle per side on the key (zero if both
  * snapshots share a bucketed layout on the key — [[graft.sources.Layout
  * .writeBucketed]]), then a map-side column compare; the filter that
  * drops unchanged rows runs before anything downstream, so output —
  * not input — size is what any consumer pays for. Null-keyed rows
  * never equi-join, so they surface as removed+added rather than
  * comparing against each other (documented, not hidden).
  */
object TableDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff requires at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshots must share a schema: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    // a caller column with a marker name would be silently overwritten
    // and every row misclassified (r12 sweep — the __salt lesson)
    require(!oldDf.columns.exists(c =>
        c == "__graft_old" || c == "__graft_new"),
      "diff: __graft_old/__graft_new are reserved by the presence markers")
    val valueCols = oldDf.columns.filterNot(keys.contains).sorted.toSeq
    val o = oldDf.alias("o")
    val n = newDf.alias("n")
    val on = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    // presence markers survive the outer join even for all-null rows
    val joined = o.withColumn("__graft_old", lit(true))
      .alias("o")
      .join(n.withColumn("__graft_new", lit(true)).alias("n"), on, "full_outer")
    val inOld = col("o.__graft_old").isNotNull
    val inNew = col("n.__graft_new").isNotNull
    // concat_ws skips NULLs, so each unchanged column contributes nothing
    val changedCols = concat_ws(",",
      valueCols.map(c =>
        when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*)
    val keyOut: Seq[Column] =
      keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    joined.select(keyOut ++ Seq(
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        when(inOld && inNew, changedCols).as("changed_cols")): _*)
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
  }
}
