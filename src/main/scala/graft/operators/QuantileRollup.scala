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
    * coarser quantile questions from it. The build-time k travels WITH
    * the rollup (a `qsample_k` column — constant, so it compresses to
    * nothing in parquet): [[estimateAcross]] derives and validates it,
    * because merging with a LARGER k than the samples were built with
    * would silently produce a bottom-K of concatenated bottom-ks that
    * is no longer a uniform sample of the union. */
  def buildRollup(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                  idCol: String, valueCol: String,
                  k: Int = 1024): DataFrame = {
    require(k > 0, s"sample size k must be positive: $k")
    df.groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(graft.functions.BottomKPair.bottomKPair(
        sampleRank(col(idCol)), col(valueCol).cast(DoubleType), k)
        .as("qsample"))
      .withColumn("qsample_k", lit(k))
  }

  /** Percentile column label for q ∈ [0, 1] without lossy rounding:
    * integral q·100 stays `p50`/`p99`; fractional percentiles keep
    * their exact decimal with `_` for the point (`p12_5`, `p99_95`) —
    * a rounded label (`p13` for q=0.125) would mislabel the estimate
    * even when no collision trips the distinct-names check. */
  private[operators] def quantileLabel(q: Double): String = {
    // BigDecimal(q) uses the double's shortest decimal form, so the
    // label matches what the caller typed (0.125 → "12.5", never
    // 12.50000000000000017...)
    val s = (BigDecimal(q) * 100).underlying.stripTrailingZeros
      .toPlainString
    "p" + s.replace(".", "_")
  }

  /** Merge the bucket samples within each `groupCols` group (the same
    * bottom-k aggregate — so the merged sample is EXACTLY the sample a
    * single pass over the union would have produced) and estimate the
    * requested quantiles: sorted sample values, element at
    * ⌊q·(m−1)⌋ (0-based) — the deterministic nearest-rank rule.
    * Output columns per [[quantileLabel]]; empty merged samples yield
    * NULLs.
    *
    * The merge k defaults to the BUILD-time k recorded in the rollup's
    * `qsample_k` column (one metadata-sized aggregate over the sample
    * table derives it; mixed build ks are rejected — their union is
    * not a uniform sample). An explicit `k` must be ≤ the build k:
    * the bottom-k' (k' ≤ k) of concatenated bottom-ks IS the
    * bottom-k' of the union, but a LARGER k' silently biases the
    * sample, contradicting the single-pass guarantee above. Rollups
    * written before the k column existed must pass their build k
    * explicitly. */
  def estimateAcross(rollup: DataFrame, groupCols: Seq[String],
                     qs: Seq[Double], k: Int = 0,
                     sampleCol: String = "qsample"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    val kCol = sampleCol + "_k"
    val hasK = rollup.columns.contains(kCol)
    val useK =
      if (k == 0) {
        // derive: one metadata-sized aggregate over the sample table
        // (|cells| rows); mixed build ks are rejected — their union is
        // not a uniform sample at any single k
        require(hasK, s"rollup carries no $kCol column — pass the " +
          "build-time k explicitly")
        val r = rollup.agg(min(col(kCol)), max(col(kCol))).head()
        if (r.isNullAt(0)) 1 // empty rollup: output is empty anyway
        else {
          require(r.getInt(0) == r.getInt(1),
            s"rollup mixes build-time sample sizes ($kCol " +
              s"${r.getInt(0)}..${r.getInt(1)}) — their union is not " +
              "a uniform sample; rebuild at one k or pass an explicit " +
              "k <= the smallest build k")
          r.getInt(0)
        }
      } else {
        require(k > 0, s"sample size k must be positive: $k")
        k
      }
    // explicit k is validated ROW-LEVEL instead of with an extra pass:
    // a cell built with k' < useK cannot honestly contribute (its
    // sample may already have dropped rows a bottom-useK of the union
    // would keep — merging would silently bias the estimate), so it
    // fails loudly at scan time; cells with k' >= useK are fine — the
    // bottom-useK of concatenated bottom-k's is exact whenever every
    // k' >= useK, so MIXED (all-large-enough) builds merge honestly
    // under an explicit k
    val checked =
      if (hasK && k > 0)
        rollup.withColumn(sampleCol,
          when(col(kCol) < useK, raise_error(concat(
            lit(s"estimate k=$useK exceeds a cell's build-time "),
            lit(s"$kCol="), col(kCol).cast(StringType),
            lit(" — the merged sample would no longer be uniform " +
              "(k <= build k required)"))))
            .otherwise(col(sampleCol)))
      else rollup
    val names = qs.map(quantileLabel)
    require(names.distinct.size == names.size,
      s"quantile labels collide: $names — space the requested qs out")
    // explode_outer: a cell whose sample is EMPTY (all-null values)
    // must still surface in the output with null estimates — plain
    // explode would silently drop the whole group; the aggregate skips
    // the resulting null pair
    val merged = checked
      .select((groupCols.map(col) :+
        explode_outer(col(sampleCol)).as("__p")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.BottomKPair.bottomKPair(
        col("__p.r"), col("__p.v"), useK).as("__s"))
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
