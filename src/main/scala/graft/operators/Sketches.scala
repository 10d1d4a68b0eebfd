package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable, MERGEABLE distinct-count sketches (Apache DataSketches
  * HLL, via Spark's `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` built-ins) — the canonical 100 TB
  * pre-aggregation pattern the raw `approx_count_distinct` (q11)
  * cannot serve: `approx_count_distinct` returns a NUMBER, so a daily
  * rollup of it cannot be re-aggregated to a monthly distinct (distinct
  * does not sum). A sketch COLUMN, by contrast, is a binary value that
  * unions losslessly: build per-(key, bucket) sketches once, persist
  * them to parquet, and answer any coarser-grained distinct question by
  * unioning sketches — without ever rescanning the raw 100 TB.
  *
  * Union exactness: two HLL sketches built at the same lgK union to
  * exactly the register state a single pass over the concatenated
  * stream would produce, so `estimate(union(per-bucket sketches)) ==
  * estimate(direct sketch)` bit-for-bit — pinned by the
  * `op_sketch_rollup` compared row's `union_eq_direct` gate and by the
  * PipelineOpsSpec parquet round-trip (persisted sketches re-aggregate
  * to the identical estimate).
  *
  * Scale shape: `buildRollup` is one hash aggregate (map-side partial
  * sketches merge before the exchange — sketch state is the partial
  * aggregate, so only lgK-bounded sketch bytes per (key, bucket) group
  * cross the wire, never raw values); `estimateAcross` re-aggregates
  * only the sketch table, which is `|keys × buckets|` rows regardless
  * of raw data volume. */
object Sketches {

  /** Aggregate Column: HLL sketch of `c` as `binary`. `lgK` trades
    * size for accuracy (2^lgK registers; 12 → ~1.6% RSE, 4 KB max). */
  def hllSketch(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Aggregate Column: union of sketch column `c` (binary → binary). */
  def hllUnion(c: Column): Column = hll_union_agg(c, lit(true))

  /** Scalar Column: estimated distinct count of a sketch (binary → bigint). */
  def hllEstimate(c: Column): Column = hll_sketch_estimate(c)

  /** The rollup-table build: one sketch of `valueCol` per
    * (`keyCols` × `bucketCol`) cell — e.g. distinct users per
    * (country, day). Persist this with `.write.parquet` and answer
    * every coarser question from it. */
  def buildRollup(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                  valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy((keyCols :+ bucketCol).map(col): _*)
      .agg(hllSketch(col(valueCol), lgK).as("sketch"))

  /** Answer a coarser-grained distinct from a persisted rollup: union
    * the bucket sketches within each `groupCols` group and estimate. */
  def estimateAcross(rollup: DataFrame, groupCols: Seq[String],
                     sketchCol: String = "sketch"): DataFrame =
    rollup.groupBy(groupCols.map(col): _*)
      .agg(hllEstimate(hllUnion(col(sketchCol))).as("distinct_est"))
}
