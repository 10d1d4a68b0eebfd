package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Deterministic weighted sampling without replacement
  * (Efraimidis–Spirakis A-ES, "Weighted random sampling with a
  * reservoir", IPL 2006): each row draws u ∈ (0,1] from a rolling hash
  * of its id — a fixed pseudo-random permutation that both engines,
  * and every retry of every task, replay bit-for-bit — and ranks by
  * ln(u)/w, monotone in the E-S key u^(1/w); the global k largest win.
  * Inclusion probability is weight-proportional in the E-S
  * without-replacement sense, which is exactly the "sample the corpus
  * toward high-quality docs, reproducibly" primitive a training-mix
  * build needs (weight = quality score, token count, domain prior...).
  *
  * Shape at scale: the key is a map-only projection; the global top-k
  * compiles to TakeOrderedAndProject — every partition keeps only its
  * own k rows and P·k rows meet at the driver-side merge. There is no
  * full sort and no shuffle of the corpus, so k bounds the cost at any
  * input size. The key is rounded to 6 places BEFORE ranking with the
  * id as tie-break, which makes the selected SET (not just each key)
  * identical across engines and plans.
  */
object WeightedSample {

  /** Key column: round(ln(u)/w, 6) with u drawn from `graft:es:<id>`.
    * Exposed so callers can reuse the identical draw (e.g. per-key
    * variants via row_number over it). `weight` must be > 0. */
  def esKey(id: Column, weight: Column): Column = {
    val h = graft.functions.RollingHash(
      concat(lit("es:"), id.cast(StringType)))
    val u = (pmod(h, lit(1000000007L)) + lit(1L)).cast(DoubleType) /
      lit(1000000008.0)
    round(log(u) / weight.cast(DoubleType), 6)
  }

  /** Global weighted k-sample: the k rows with the largest E-S keys,
    * ties broken by ascending id. Returns the input columns plus
    * `es_key`. */
  def sample(df: DataFrame, id: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    df.withColumn("es_key", esKey(col(id), weight))
      .orderBy(col("es_key").desc, col(id))
      .limit(k)
  }
}
