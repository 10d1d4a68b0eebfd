package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot timing probe for the weighted prefix arm on the
  * adversarial corpus (2k vocab, 100k distinct random 12-token sets) —
  * isolates the r9 Cauchy-Schwarz positional filter's effect without
  * paying the full ScaleProbe board.
  * Run: `sbt "Test/runMain graft.TfProbe"` */
object TfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 100000L
    val adv = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id") + lit(i * 7919)),
          lit(2000)))): _*).as("text"))
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = graft.llm.Dedup.tfidfPairs(adv, "doc_id", "text", 0.9)
        .count()
      println(f"[tf] adversarial round $round: $c pairs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // the Jaccard PPJoin arm on the SAME corpus — the comparison bar
    // for the weighted arm (r9 verdict #3: weighted ≤ ~2× of this)
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = graft.llm.Dedup.allPairs(adv, "doc_id", "text", 0.9)
        .count()
      println(f"[tf] jaccard arm round $round: $c pairs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
