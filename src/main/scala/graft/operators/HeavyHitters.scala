package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** EXACT heavy hitters (keys with frequency > φ·N) without a
  * full-key-space shuffle.
  *
  * The naive `groupBy(key).count.filter` shuffles one record per
  * DISTINCT key — at 100 TB of documents keyed by domain or user that
  * exchange is the job. Here the classic two-pass sketch-then-verify:
  *
  *  1. Each input partition runs a Misra–Gries summary with
  *     k = ⌈1/φ⌉ counters — O(k) state, one pass, no shuffle. MG
  *     guarantees a key absent from the summary has local count
  *     ≤ nₚ/(k+1) < φ·nₚ; summing over partitions, any key with
  *     GLOBAL count > φ·N must surface in at least one partition's
  *     summary (pigeonhole). The union of summaries is therefore a
  *     guaranteed candidate SUPERSET, of size ≤ k · partitions —
  *     thousands of rows, not billions.
  *  2. A broadcast semi-join keeps only candidate rows, and an exact
  *     count over that sliver (the only shuffle — bounded by
  *     candidates × partitions) is thresholded against φ·N.
  *
  * Result is EXACTLY `SELECT key, count(*) … HAVING count(*) > φ·N`
  * (the oracle twin) — the sketch only prunes, never decides.
  * NULL keys are ignored (SQL GROUP BY would emit them, but a null
  * "heavy hitter" is never what the caller means; documented contract).
  */
object HeavyHitters {

  def heavyHitters(df: DataFrame, key: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1): $phi")
    require(key != "__graft_hh_cand",
      "column name __graft_hh_cand is reserved by HeavyHitters")
    val k = math.ceil(1.0 / phi).toInt
    val spark = df.sparkSession
    val keyed = df.select(col(key))
    val keySchema = StructType(Seq(keyed.schema.fields.head))

    // pass 1: per-partition Misra–Gries candidate surfacing (map-only)
    val candidates = keyed.mapPartitions { iter =>
      val counters = new java.util.HashMap[Any, Long](k * 2)
      iter.foreach { row =>
        val v = row.get(0)
        if (v != null) {
          val c = counters.get(v)
          if (c != 0L) counters.put(v, c + 1)
          else if (counters.size < k) counters.put(v, 1L)
          else {
            // decrement-all: each sweep retires k arrivals → amortized
            // O(1) per input row
            val it = counters.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getValue == 1L) it.remove()
              else e.setValue(e.getValue - 1)
            }
          }
        }
      }
      val out = new Array[Row](counters.size)
      val it = counters.keySet().iterator()
      var i = 0
      while (it.hasNext) { out(i) = Row(it.next()); i += 1 }
      out.iterator
    }(Encoders.row(keySchema)).distinct()

    val n = df.count()
    // pass 2: exact recount of the candidate sliver only
    df.join(broadcast(candidates.withColumnRenamed(key, "__graft_hh_cand")),
        col(key) === col("__graft_hh_cand"), "left_semi")
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(n.toDouble))
  }
}
