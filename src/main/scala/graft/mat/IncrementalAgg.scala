package graft.mat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed aggregate table up to
  * date by merging the aggregate STATE of each new batch into the stored
  * state, instead of re-scanning all history — the difference between a
  * daily job that reads one day and one that reads 100 TB. Supported
  * aggregates form the classic commutative-monoid algebra (sum, count,
  * min, max); avg is derived at read time as sum/count, and distinct
  * counts route to the mergeable HLL sketches of
  * [[graft.llm.Dedup.sketchRollup]] (op_sketch_rollup) — exactly the
  * split Spark itself uses for partial aggregation, lifted from within
  * one query to across materialization runs.
  *
  * `aggregate` produces the state table for a batch (or for history, on
  * first run); `merge` folds a new batch's state into the stored state
  * with one union + one groupBy on the key. The invariant — pinned by
  * spec and by the `op_incremental_agg` oracle row — is
  * `merge(aggregate(history), batch) == aggregate(history ∪ batch)`.
  *
  * Shape at scale: the batch is scanned once (map-side partial agg
  * combines before the shuffle); the state table is aggregate-sized,
  * never raw-sized, so the merge shuffle moves |keys| rows, not |rows|.
  * Non-mergeable aggregates (median, exact distinct) are rejected at
  * construction rather than silently recomputed over history.
  */
object IncrementalAgg {

  /** One state column: `kind` ∈ sum|count|min|max over `input`
    * (count ignores `input`, counting rows), stored as `name`. */
  final case class Spec(name: String, kind: String, input: String) {
    require(Set("sum", "count", "min", "max")(kind),
      s"non-mergeable aggregate '$kind' — use sketches (HLL) for distinct " +
        "counts, or derive avg from sum/count")
  }

  /** Aggregate raw rows into state (first run, and per-batch input to
    * [[merge]]). */
  def aggregate(df: DataFrame, keys: Seq[String], specs: Seq[Spec]): DataFrame = {
    require(keys.nonEmpty && specs.nonEmpty, "keys and specs required")
    val aggs = specs.map {
      case Spec(n, "sum", in)   => sum(col(in)).as(n)
      case Spec(n, "count", _)  => count(lit(1)).as(n)
      case Spec(n, "min", in)   => min(col(in)).as(n)
      case Spec(n, "max", in)   => max(col(in)).as(n)
      case s => throw new IllegalArgumentException(s.toString)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a raw batch into existing state; result has the state schema.
    * Counts and sums add, mins/maxes fold — each state column merges by
    * its own monoid, so the union'd groupBy below is the whole merge. */
  def merge(state: DataFrame, batch: DataFrame, keys: Seq[String],
            specs: Seq[Spec]): DataFrame = {
    val batchState = aggregate(batch, keys, specs)
    val folds = specs.map {
      case Spec(n, "sum", _)   => sum(col(n)).as(n)
      case Spec(n, "count", _) => sum(col(n)).as(n)
      case Spec(n, "min", _)   => min(col(n)).as(n)
      case Spec(n, "max", _)   => max(col(n)).as(n)
      case s => throw new IllegalArgumentException(s.toString)
    }
    state.unionByName(batchState.select(state.columns.map(col): _*))
      .groupBy(keys.map(col): _*).agg(folds.head, folds.tail: _*)
  }
}
