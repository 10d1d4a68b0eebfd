package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question probe: does Catalyst's InjectRuntimeFilter put a bloom
  * filter (or DPP subquery) on the INDEX side of the banded novelty
  * probe's `band_key` equi-join? If yes, a small batch would skip most
  * index row groups at scan time (min/max + bloom pushdown) — making
  * the signature probe sub-O(index) in IO like the embedding probe's
  * cell pruning; if no, the per-batch index scan stands as documented.
  * Run: `sbt "Test/runMain graft.BloomProbe"` */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.streaming.Events.createSignatureIndex(spark, "bloom_idx",
      spark.range(200000).select(xxhash64($"id").as("sig")), "sig")
    val batch = spark.range(500).select($"id".as("media_id"),
      xxhash64($"id" + 999).as("s"))
    val probe = graft.streaming.Events.noveltyBandedJoin(batch, "s",
      spark.table("bloom_idx"), 3)
    val opt = probe.queryExecution.optimizedPlan.toString
    val phys = probe.queryExecution.executedPlan.toString
    println("[bloom] conf=" + spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.enabled").getOrElse("unset"))
    println("[bloom] optimized has bloom="
      + opt.toLowerCase.contains("bloom"))
    println("[bloom] optimized has dynamicpruning="
      + opt.toLowerCase.contains("dynamicpruning"))
    println("[bloom] physical has runtime filter="
      + (phys.toLowerCase.contains("bloom")
        || phys.toLowerCase.contains("dynamicpruning")))
    spark.stop()
  }
}
