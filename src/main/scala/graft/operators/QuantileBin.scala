package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-wise equi-depth (quantile) binning: assign each row the
  * 1..nbins bucket of its value within its group — the standard
  * discretization step before crossing a continuous feature with a
  * categorical one (decile of doc quality per source, price decile per
  * order priority). Exact SQL `ntile` semantics: buckets differ in
  * size by at most one row, the first `count % nbins` buckets take the
  * extra row — deterministic given a total order, which is why
  * `tieBreak` columns are required: ties in the value column would
  * otherwise make bucket boundaries nondeterministic across runs and
  * engines.
  *
  * Shape at scale: one exchange on the group key + one per-partition
  * sort, then a frame-free rank pass — state per key is a counter, not
  * a buffer (WindowExec's ntile path). This is the right shape when
  * groups are many (sources, domains, priorities). For a GLOBAL bin
  * over one giant group, a single ntile window would serialize into
  * one partition — use the broadcast-cutpoint pattern instead
  * ([[Winsorize]]'s shape: aggregate approx percentiles, broadcast the
  * nbins-sized cut array, bin map-side). */
object QuantileBin {

  def assign(df: DataFrame, keys: Seq[String], value: String,
             nbins: Int, tieBreak: Seq[String]): DataFrame = {
    require(nbins > 0, s"nbins must be positive: $nbins")
    require(tieBreak.nonEmpty,
      "tieBreak columns are required: ntile over a non-total order is " +
        "nondeterministic")
    val order: Seq[Column] = col(value) +: tieBreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(s"${value}_bin", ntile(nbins).over(w))
  }
}
