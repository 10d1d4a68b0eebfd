package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the latest right row
  * with `rightTs <= leftTs` in the same key group. The operator Spark
  * lacks natively (DuckDB spells it `ASOF JOIN`, the oracle twin), and
  * the backbone of feature/label alignment in training-data pipelines.
  *
  * Implementation (composition of built-ins, SURVEY §7.5 preference (a)):
  * tag and union both sides, then ONE window pass per key group ordered
  * by (ts, side) carries the last-seen right payload forward onto left
  * rows. Cost = one shuffle on the keys + a sort within partitions —
  * never the naive range cross-join (which is quadratic per key), and
  * no per-row probe structure. At 100 TB both sides shuffle once;
  * skewed keys fall under AQE like any window.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so a right row
  * at exactly `ts` matches (the `<=` of ASOF). The right side must be
  * unique per (keys, ts) — pre-aggregate duplicates (the window would
  * otherwise pick the partition-order-dependent last one).
  */
object AsOfJoin {

  /** Single-key form — see the multi-key overload. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightValueCols: Seq[String],
           tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, Seq(key), ts, rightValueCols, tolerance)

  /** Composite-key as-of join (DuckDB ASOF takes any number of equality
    * conditions plus one inequality; same here — the window partitions
    * by the full key tuple).
    *
    * `tolerance`: maximum lookback — a carried right row older than
    * `leftTs - tolerance` does NOT match (pandas `merge_asof(tolerance=)`
    * / kdb `wj` window semantics). Any expression subtractable from the
    * ts column: an `expr("INTERVAL 1 HOUR")` for timestamps, a plain
    * number for numeric ts. Evaluated inside the same single window
    * pass — no extra shuffle: the carried struct keeps the right row's
    * own timestamp, and the last-at-or-before row either satisfies the
    * window or nothing earlier can. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           ts: String, rightValueCols: Seq[String],
           tolerance: Option[Column]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    require(rightValueCols.nonEmpty, "as-of join needs right value columns")
    val leftCols = left.columns.toIndexedSeq
    val rvType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        right.schema(ts).dataType) +:
        rightValueCols.map(c => right.schema(c)))
    def keysNotNull = keys.map(k => col(k).isNotNull).reduce(_ && _)

    // a right row with a NULL key or NULL timestamp can never be an ASOF
    // match, but if it entered the union it would sort nulls-first inside
    // a valid key partition and its payload would be carried onto left
    // rows that have no earlier valid right match — drop such rows up
    // front (the left-side mask below handles null LEFT rows)
    val rUnion = right
      .filter(keysNotNull && col(ts).isNotNull)
      .select(
      (leftCols.map { c =>
        if (keys.contains(c) || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ struct(col(ts).as("__rts") +: rightValueCols.map(col): _*)
        .cast(rvType).as("__rv")
        :+ lit(0).as("__side")): _*)
    val lUnion = left.select(
      (leftCols.map(col) :+ lit(null).cast(rvType).as("__rv")
        :+ lit(1).as("__side")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ASOF never matches on NULL keys or NULL timestamps (the window
    // would otherwise group null keys together and carry right-side
    // values onto null-key left rows, where SQL join semantics say no
    // match) — mask the carried payload for those rows
    // tolerance: the carried row is the LATEST right row at-or-before
    // this ts; if even it falls outside the lookback window, no earlier
    // row can be inside it → correctly null
    val carriedOk = tolerance match {
      case Some(tol) =>
        col("__carried").isNotNull &&
          col("__carried").getField("__rts") >= col(ts) - tol
      case None => lit(true)
    }
    lUnion.unionByName(rUnion)
      .withColumn("__carried",
        when(keysNotNull && col(ts).isNotNull,
          last(col("__rv"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightValueCols.map(c =>
        when(carriedOk, col("__carried").getField(c)).as(s"r_$c"))): _*)
  }
}
