package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 decomposition of dd_minhash_novelty_collapse (r17 verdict #4 —
  * its sf1 ratio, 1.5×, runs above the 1.2× collapse-family band):
  * phase-timed replica of the declared query — sign, intra-batch
  * collapse, then the full ingest (probe + sink/index writes) — so the
  * elevated tail is attributed to compute (the collapse component
  * loop) or to the write/commit train before anything is changed.
  * Run: `sbt "Test/runMain graft.MhCollapseProbe"` */
object MhCollapseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        { jobs.incrementAndGet(); () }
    })
    def time(name: String)(body: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      body
      println(f"[mhcol] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  ${jobs.get() - j0}%3d jobs")
    }
    for (round <- 1 to 2) {
      println(s"[mhcol] ==== round $round")
      var d: org.apache.spark.sql.DataFrame = null
      time("ckpt") {
        d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint()
      }
      val batch = d.unionByName(
        d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      var signed: org.apache.spark.sql.DataFrame = null
      time("sign (MinHashSig+bands)") {
        signed = batch
          .withColumn("__arr",
            graft.functions.MinHashSig(lower(col("text")), 3, 16))
          .withColumn("mh_bands", when(col("text").isNotNull,
            graft.llm.Dedup.minhashBandArray(col("__arr"), 16, 4)))
          .drop("__arr")
          .localCheckpoint()
      }
      time("collapseByBands") {
        graft.streaming.Events.collapseByBands(signed, "mh_bands")
          .write.format("noop").mode("overwrite").save()
      }
      val idxT = "mhcol_probe_idx"; val sinkT = "mhcol_probe_sink"
      for (tb <- Seq(idxT, sinkT))
        spark.sql(s"DROP TABLE IF EXISTS $tb")
      time("createBandIndex (empty)") {
        graft.streaming.Events.createBandIndex(spark, idxT,
          spark.range(0).select(lit(null).cast("array<string>").as("b")),
          "b")
      }
      time("full ingest batch") {
        graft.streaming.Events.minhashNoveltyIngestBatch(
          batch, 0L, idxT, sinkT, collapseIntraBatch = true)
      }
      time("sink read") {
        spark.table(sinkT).select(col("doc_id"), col("batch_id"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
