package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key row caps — "at most k documents per domain/source" — the
  * standard guard against over-represented sources dominating a
  * training mix (domain caps), and the generic top-k-per-group
  * primitive (best-k by quality, latest-k by time).
  *
  * Deterministic: callers pass a total order (ties broken by the order
  * columns themselves — include a unique id as the last column for a
  * strict total order, or the cap is partition-order-dependent).
  *
  * Scale shape: ONE window pass — and because the predicate is a
  * `row_number() <= k`, Spark's rank-limit pushdown turns it into a
  * WindowGroupLimit: each input partition keeps only its own top k per
  * key BEFORE the exchange, so the shuffle carries at most
  * k·|keys present per partition| rows, not the corpus
  * (plan-asserted in PlanAuditSpec). At 100 TB with a cap of 1000 per
  * domain, the exchange moves the CAP, not the crawl.
  */
object TopKPerKey {

  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int): DataFrame = {
    require(keys.nonEmpty, "topKPerKey needs at least one key")
    require(order.nonEmpty, "topKPerKey needs an ordering")
    require(k >= 1, s"k must be >= 1, got $k")
    val rn = Iterator.iterate("__graft_rn")(_ + "_")
      .dropWhile(df.columns.contains).next()
    df.withColumn(rn, row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
