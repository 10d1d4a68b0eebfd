package graft.sources

import org.apache.spark.sql.DataFrame

/** Physical-layout operators for 100 TB table design.
  *
  * At cluster scale the dominant cost of the big fact-table joins and
  * repeated probes is the shuffle; these writers pre-pay it once at
  * load time:
  *
  *  - [[writeBucketed]] — hash-bucket (and sort) by the join keys.
  *    Tables bucketed the same way equi-join with NO shuffle on either
  *    side (SortMergeJoin reads co-located buckets directly); asserted
  *    at the plan level in LayoutSpec.
  *  - [[writePartitioned]] — directory-partition by a low-cardinality
  *    column; filters on it prune whole directories before any IO
  *    (partition pruning — e.g. the IVF `cell` column, so an ANN probe
  *    reads |probed cells|/nlist of the corpus).
  */
object Layout {

  /** Bucketed+sorted table write: `buckets` hash buckets on `keys`.
    * Equi-joins between same-bucketed tables skip the shuffle; the
    * sort makes SortMergeJoin skip its sort too. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Directory-partitioned table write (partition pruning on reads). */
  def writePartitioned(df: DataFrame, table: String,
                       partCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCols: _*)
      .format("parquet")
      .saveAsTable(table)
}
