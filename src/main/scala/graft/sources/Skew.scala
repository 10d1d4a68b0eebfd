package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for extreme single-key hot spots.
  *
  * AQE's runtime skew-join already splits oversized SMJ partitions; these
  * helpers cover the cases it can't: a key so hot that a single reducer
  * overflows even after splitting, and skewed aggregation state.
  */
object Skew {

  /** Row-content salt: deterministic under task retry. A salt from
    * monotonically_increasing_id/rand recomputes DIFFERENTLY when a
    * partial map-stage retry re-runs (the SPARK-23207 class of silent
    * row loss/duplication on shuffle keys); hashing the full row content
    * is stable no matter how many times the task re-executes. Identical
    * rows share a salt — acceptable: hot-key rows almost always differ
    * somewhere, and correctness never depends on the spread. */
  private def contentSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))
      .cast("int")

  /** Salted inner equi-join: the big side gets a deterministic
    * content-derived salt in [0, salts); the small side replicates
    * `salts` times; the join key becomes (key, salt). Produces exactly
    * the rows of the plain inner join, but the hot key's rows spread
    * over `salts` reducers. Trade: small side is materialized `salts`×,
    * so keep `salts` modest (16-64) and the small side genuinely small. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    // a caller column named __salt would be silently overwritten, fed
    // into its own content hash, and dropped from the output — reject
    // loudly (r12 sweep; the zOrder writer's suffix-until-free dodge
    // doesn't compose with a two-sided join key tuple)
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin: __salt is reserved by the salting machinery")
    val salted = big.withColumn("__salt", contentSalt(big, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostic — the measurement you run BEFORE choosing a
    * skew mitigation (salting, AQE skew-join, broadcast): group-size
    * distribution of a prospective shuffle key. One groupBy(key) count
    * (map-side combined) then one single-row aggregate over the
    * key-count table. `skew_ratio` = max group / mean group: ~1 means
    * uniform (plain shuffle is fine), ≫ 32 (the executor-thread count)
    * means the largest key alone outlasts the rest of the stage —
    * salt it. Percentiles are exact (the key-count table has one row
    * per key — small even when the input is 100 TB). */
  def keyProfile(df: DataFrame, key: String): DataFrame = {
    val sizes = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"),
      round(expr("percentile(n, 0.5)"), 6).as("p50_n"),
      round(expr("percentile(n, 0.99)"), 6).as("p99_n"),
      round(max(col("n")).cast("double") /
        (sum(col("n")).cast("double") / count(lit(1))), 4).as("skew_ratio"))
  }

  /** Two-phase (salted) aggregation for re-aggregable functions: phase 1
    * aggregates on (keys, salt), phase 2 merges the partials. Spark's
    * hash aggregate already partial-aggregates map-side; this helps when
    * the FINAL aggregation state per key is itself huge (e.g.
    * collect-style or distinct-heavy state on a hot key).
    *
    * `partials` aggregate the raw rows; `merges` re-aggregate the
    * partial columns (referenced by their output names). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts > 0 && keys.nonEmpty)
    require(!df.columns.contains("__salt"),
      "saltedAgg: __salt is reserved by the salting machinery")
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }
}
