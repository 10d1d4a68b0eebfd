package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistable, MERGEABLE quantile-sample rollup — the quantile twin of
  * [[Sketches]]' HLL rollup, for the other re-aggregation question a
  * 100 TB metrics pipeline asks: `percentile_approx` returns a NUMBER,
  * so a daily rollup of it cannot be re-aggregated into a monthly
  * percentile (quantiles do not average). This rollup stores a
  * deterministic bottom-k (KMV) row sample per (key, bucket) cell —
  * rank = the shared rolling hash of the row id, so the k
  * smallest-ranked rows are a uniform sample — and bottom-k states
  * union LOSSLESSLY: the bottom-k of a union is the bottom-k of the
  * concatenated bottom-ks. Any coarser-grained quantile is then
  * estimated from the merged sample without rescanning raw data, with
  * the standard O(1/√k) sample-quantile error.
  *
  * Everything is DETERMINISTIC (hash ranks, lexicographic tie-break,
  * fixed index-pick rule), so unlike t-digest/KLL the whole pipeline —
  * sampling, merging, estimating — replays exactly in an independent
  * SQL engine: the `op_quantile_rollup` oracle recomputes every rank
  * and both bottom-k passes and hash-compares the estimates.
  *
  * Scale shape: [[buildRollup]] is one ObjectHashAggregate
  * ([[graft.functions.BottomKPair]] — bounded k-pair heap per group,
  * partial→final merge, k pairs per cell on the exchange, never the
  * raw rows); [[estimateAcross]] re-aggregates only the sample table
  * (|cells| × k rows regardless of raw volume). */
object QuantileRollup {

  /** The deterministic sample rank of a row id — the shared
    * rolling-hash recurrence, replayable in any engine. */
  def sampleRank(id: Column): Column =
    graft.functions.RollingHash(concat(lit("qs:"), id.cast(StringType)))

  /** One bottom-k (rank, value) sample per (`keyCols` × `bucketCol`)
    * cell. `idCol` must be row-unique (it seeds the sample rank);
    * NULL values are excluded from the sample (they carry no
    * quantile information). Persist with `.write.parquet` and answer
    * coarser quantile questions from it. */
  def buildRollup(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                  idCol: String, valueCol: String,
                  k: Int = 1024): DataFrame =
    df.groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(graft.functions.BottomKPair.bottomKPair(
        sampleRank(col(idCol)), col(valueCol).cast(DoubleType), k)
        .as("qsample"))

  /** Merge the bucket samples within each `groupCols` group (the same
    * bottom-k aggregate — so the merged sample is EXACTLY the sample a
    * single pass over the union would have produced) and estimate the
    * requested quantiles: sorted sample values, element at
    * ⌊q·(m−1)⌋ (0-based) — the deterministic nearest-rank rule.
    * Output columns `p<q·100>`; empty merged samples yield NULLs. */
  def estimateAcross(rollup: DataFrame, groupCols: Seq[String],
                     qs: Seq[Double], k: Int = 1024,
                     sampleCol: String = "qsample"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    val names = qs.map(q => f"p${q * 100}%.0f")
    require(names.distinct.size == names.size,
      s"quantile labels collide: $names — space the requested qs out")
    // explode_outer: a cell whose sample is EMPTY (all-null values)
    // must still surface in the output with null estimates — plain
    // explode would silently drop the whole group; the aggregate skips
    // the resulting null pair
    val merged = rollup
      .select((groupCols.map(col) :+
        explode_outer(col(sampleCol)).as("__p")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.BottomKPair.bottomKPair(
        col("__p.r"), col("__p.v"), k).as("__s"))
    val vals = array_sort(transform(col("__s"), p => p.getField("v")))
    val m = size(vals)
    val ests = qs.zip(names).map { case (q, nm) =>
      when(m > 0, element_at(vals,
        (floor(lit(q) * (m - 1).cast(DoubleType)) + 1)
          .cast(IntegerType))).as(nm)
    }
    merged.select(groupCols.map(col) ++ ests: _*)
  }
}
