package graft

import org.apache.spark.sql.SparkSession

/** r16 (r15 verdict #3) — dd_key_novelty_grow elevation adjudication.
  * The row rose 3.68 → 4.96/5.42 s across BOTH independent r15 boards
  * (the builder's own repeat rule), so it gets the BoardOrderProbe
  * treatment: run the registered query verbatim 6× to steady state in
  * one JVM at the board's SF, alongside the two frozen class sentinels
  * — if the solo steady state sits at the r14 level while the board
  * number is elevated, the elevation is harness/JIT class drift (now
  * mechanical via the class-normalized regression list,
  * tools/bench_board.py r16); if the solo level itself rose, it's code.
  * Run: `sbt "Test/runMain graft.KeyNovProbe"` → archive as
  * test_archive/key_nov_probe_r16.txt */
object KeyNovProbe {
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
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (pass <- 1 to 6) {
      time(f"dd_key_novelty_grow pass $pass") {
        SparkEntry.queries("dd_key_novelty_grow")(spark, sfDir)
      }
      time(f"sentinel drift      pass $pass (fn_safe_cast)") {
        SparkEntry.queries("fn_safe_cast")(spark, sfDir)
      }
    }
    // stage + job decomposition (AudioGrowProbe pattern): where the
    // steady-state seconds go — the row is checkpoint + create + two
    // ingest batches + sink read, each a driver-serial job train whose
    // floor is write/commit overhead, not compute
    import org.apache.spark.sql.functions._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def t(label: String)(body: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      body
      println(f"[probe] stage $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${jobs.get() - j0}%3d jobs")
    }
    val idxT = "dd_keynov_grow_idx"; val sinkT = "dd_keynov_grow_sink"
    for (pass <- 1 to 2) {
      println(s"[probe] ---- decomposition pass $pass")
      for (tb <- Seq(idxT, sinkT)) spark.sql(s"DROP TABLE IF EXISTS $tb")
      var d: org.apache.spark.sql.DataFrame = null
      t("ckpt") {
        d = Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"))
          .withColumn("k", md5(lower(col("text")).cast("binary")))
          .localCheckpoint()
      }
      t("createKeyIndex") {
        graft.streaming.Events.createKeyIndex(spark, idxT,
          d.filter(col("doc_id") < 100).select(col("k")), "k")
      }
      t("batch0") {
        graft.streaming.Events.keyNoveltyIngestBatch(
          d.filter(col("doc_id") >= 100), 0L, idxT, sinkT, "k")
      }
      t("batch1") {
        graft.streaming.Events.keyNoveltyIngestBatch(
          d.select((col("doc_id") + 10000).as("doc_id"), col("text"),
            col("k")), 1L, idxT, sinkT, "k")
      }
      t("sink_read") {
        spark.table(sinkT).select(col("doc_id"), col("batch_id"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
