package graft.mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** ANALYZE-style one-pass table profiling: per column — row count,
  * non-null count, NDV, min/max rendered as strings (the catalog-stats
  * convention; cf. the reference's get_catalog column metadata surface,
  * catalog.sql:1-175, which this extends with the statistics a CBO or a
  * data-quality check actually consumes).
  *
  * Exact NDV uses Spark's multi-distinct rewrite (one Expand over the
  * scan — rows × #profiled-columns in the map pipeline, but partial
  * aggregation collapses each task to its distinct values before the
  * single exchange). `approx = true` swaps in HyperLogLog++
  * `approx_count_distinct` and the plan stays one un-expanded
  * aggregation pass — the 100 TB default, and exactly what
  * ANALYZE TABLE ... COMPUTE STATISTICS collects. Driver state is one
  * aggregate row (4·#cols + 1 values) — model-sized by construction.
  *
  * Output: (col_name, n_rows, n_nonnull, ndv, min_val, max_val),
  * ordered by col_name; min/max are NULL for all-null columns.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cs.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cs.flatMap { c =>
      val ndv: Column =
        if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
      Seq(count(col(c)).as(s"${c}__n"), ndv.as(s"${c}__ndv"),
        min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val r = df.agg(aggs.head, aggs.drop(1): _*).head()
    val total = r.getLong(0)
    cs.zipWithIndex.map { case (c, i) =>
      val b = 1 + i * 4
      (c, total, r.getLong(b), r.getLong(b + 1),
        if (r.isNullAt(b + 2)) null else r.getString(b + 2),
        if (r.isNullAt(b + 3)) null else r.getString(b + 3))
    }.toDF("col_name", "n_rows", "n_nonnull", "ndv", "min_val", "max_val")
      .orderBy(col("col_name"))
  }
}
