package graft.mat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-change handling for incremental runs plus the column-alteration
  * operators (reference incremental.sql:41,79-86 `on_schema_change` /
  * `expand_target_column_types`, and adapters.sql:242-312 add/drop/retype).
  *
  * Parquet tables have no in-place UPDATE, so retype/drop are expressed as
  * read → transform → rewrite plans (SURVEY §7.4); the functions here
  * return the transformed DataFrame and the Materializer swaps it in.
  */
object SchemaEvolution {

  /** dbt's on_schema_change contract (dbt-core semantics, dispatched by
    * incremental.sql:83-86):
    *  - ignore (default): staged data projected onto the target's columns;
    *  - fail: any added/removed column aborts;
    *  - append_new_columns: new staged columns appended (target rows get
    *    NULL); removed columns keep their target values;
    *  - sync_all_columns: add new + drop removed.
    * Returns the staged frame aligned to the post-change target schema.
    */
  def processSchemaChanges(mode: String, target: DataFrame,
                           staged: DataFrame): DataFrame = {
    val tCols = target.columns.map(_.toLowerCase).toIndexedSeq
    val sCols = staged.columns.map(_.toLowerCase).toIndexedSeq
    val added = staged.columns.filterNot(c => tCols.contains(c.toLowerCase))
    val removed = target.columns.filterNot(c => sCols.contains(c.toLowerCase))
    mode match {
      case "ignore" =>
        // project staged onto the target's columns; removed columns get null
        val proj = target.schema.fields.map { f =>
          if (sCols.contains(f.name.toLowerCase)) staged(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }
        staged.select(proj.toIndexedSeq: _*)
      case "fail" =>
        if (added.nonEmpty || removed.nonEmpty)
          throw new IllegalStateException(
            s"on_schema_change=fail: added=${added.mkString(",")} removed=${removed.mkString(",")}")
        staged.select(target.columns.map(col).toIndexedSeq: _*)
      case "append_new_columns" =>
        val proj = target.schema.fields.map { f =>
          if (sCols.contains(f.name.toLowerCase)) staged(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        } ++ added.map(staged(_))
        staged.select(proj.toIndexedSeq: _*)
      case "sync_all_columns" => staged
      case other =>
        throw new IllegalArgumentException(s"bad on_schema_change: $other")
    }
  }

  /** expand_target_column_types (incremental.sql:79-81, dbt BaseColumn
    * semantics): widen target columns so staged values fit — string sizes
    * and decimal precision/scale grow, never shrink. Spark strings are
    * already unbounded, so only decimal widening materially applies;
    * returns the target with widened casts. */
  def expandColumnTypes(target: DataFrame, staged: DataFrame): DataFrame = {
    val stagedTypes = staged.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    val cols = target.schema.fields.map { f =>
      (f.dataType, stagedTypes.get(f.name.toLowerCase)) match {
        case (t: DecimalType, Some(s: DecimalType))
            if s.precision > t.precision || s.scale > t.scale =>
          val scale = math.max(t.scale, s.scale)
          val intDigits = math.max(t.precision - t.scale,
            s.precision - s.scale)
          col(f.name)
            .cast(DecimalType(math.min(38, intDigits + scale), scale))
            .as(f.name)
        case _ => col(f.name)
      }
    }
    target.select(cols.toIndexedSeq: _*)
  }

  /** alter_relation_add_remove_columns (adapters.sql:242-263) as a frame
    * rewrite: add columns (typed nulls) + drop columns. */
  def addRemoveColumns(df: DataFrame,
                       add: Seq[(String, DataType)],
                       remove: Seq[String]): DataFrame = {
    val withAdds = add.foldLeft(df) { case (d, (n, t)) =>
      d.withColumn(n, lit(null).cast(t))
    }
    withAdds.drop(remove: _*)
  }

  /** alter_column_type (adapters.sql:297-312): the reference's 4-step
    * tmp-column dance collapses to a single cast-in-place rewrite. */
  def alterColumnType(df: DataFrame, column: String,
                      newType: DataType): DataFrame =
    df.withColumn(column, col(column).cast(newType))
}
