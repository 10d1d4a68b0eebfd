package graft.mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** dbt's generic data tests, Spark-native. The reference adapter ships
  * no test macros of its own — `dbt test` compiles the four core
  * generic tests in dbt-core to SQL the adapter merely executes — so a
  * user switching engines needs the same four semantics here:
  *
  *  - `unique`: non-null values that appear more than once;
  *  - `not_null`: rows where the column is null;
  *  - `accepted_values`: non-null values outside the allowed set;
  *  - `relationships`: non-null child values with no parent row
  *    (referential integrity).
  *
  * Each test returns its VIOLATION rows (dbt semantics: a test passes
  * when the compiled query returns zero rows), and [[summary]] folds
  * any batch of tests into the (test_name, n_violations, passed) table
  * a `dbt test` run prints. Scale shape: unique/accepted_values are
  * one hash aggregate; not_null is a filter; relationships is a
  * left-anti join (broadcast when the parent is a dim). Null-key
  * semantics follow dbt: nulls are not unique-violations and not
  * relationship-violations — `not_null` is the test for nulls.
  */
object DataTests {

  /** Values violating uniqueness: (value, n_records), n_records > 1. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column).as("value"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** Rows where the column is null (full rows, as dbt returns them). */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** Non-null values outside the accepted set: (value, n_records). */
  def acceptedValues(df: DataFrame, column: String,
                     values: Seq[Any]): DataFrame =
    df.filter(col(column).isNotNull &&
        !col(column).isin(values: _*))
      .groupBy(col(column).as("value"))
      .agg(count(lit(1)).as("n_records"))

  /** Child ROWS with no matching parent (left-anti): one output row
    * per violating child row — exactly dbt's compiled relationships
    * test, so a repeated missing FK value counts once per occurrence
    * in [[summary]] (r6 ADVICE: the grouped-by-value form undercounted
    * vs `dbt test`). Nulls are skipped (dbt ignores null FKs). */
  def relationships(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String): DataFrame =
    child.filter(col(childCol).isNotNull)
      .select(col(childCol).as("value"))
      .join(parent.select(col(parentCol).as("value")),
        Seq("value"), "left_anti")

  /** Fold named tests into the `dbt test` result table:
    * (test_name, n_violations, passed), one row per test. Each count is
    * a separate aggregate job (matching dbt, which runs each compiled
    * test query independently). */
  def summary(tests: Seq[(String, DataFrame)]): DataFrame = {
    require(tests.nonEmpty, "no tests given")
    val spark = tests.head._2.sparkSession
    import spark.implicits._
    tests.map { case (name, violations) =>
      val n = violations.count()
      (name, n, n == 0L)
    }.toDF("test_name", "n_violations", "passed")
  }
}
