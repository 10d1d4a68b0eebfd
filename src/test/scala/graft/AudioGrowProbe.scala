package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 (r14 verdict #5) — stage decomposition of mm_audio_novelty_grow,
  * the one ingest-family row that did not recover its r13 time (§8.23
  * attributed +0.7 s to the create-time cap window; §8.24's cap-skip
  * guard recovered 0.84× of it; this probe attributes the rest).
  * Times, per run (min of 2 after warm-up, the board convention):
  * media synthesis, seed fingerprinting + index create, each ingest
  * batch, and the sink read — plus the isolated decode and append
  * pieces the batches are made of. Run:
  * `sbt "Test/runMain graft.AudioGrowProbe"` */
object AudioGrowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Multimodal
    import graft.streaming.Events

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    val idxT = "agp_idx"; val sinkT = "agp_sink"

    def oneRun(): Seq[(String, Double)] = {
      for (tb <- Seq(idxT, sinkT)) spark.sql(s"DROP TABLE IF EXISTS $tb")
      var media: org.apache.spark.sql.DataFrame = null
      val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      stages += "synth+ckpt" -> time {
        media = Multimodal.syntheticContentAudio(
          Tables.load(spark, sfDir, "documents")).localCheckpoint()
      }
      stages += "seed_fp+create" -> time {
        Events.createSignatureIndex(spark, idxT,
          Multimodal.audioFingerprints(media.filter(col("media_id") < 30))
            .select(col("afp").as("sig")), "sig")
      }
      stages += "batch0" -> time {
        Events.audioNoveltyIngestBatch(
          media.filter(col("media_id") >= 30 && col("media_id") < 60),
          0L, idxT, sinkT)
      }
      stages += "batch1" -> time {
        Events.audioNoveltyIngestBatch(
          media.filter(col("media_id") >= 60), 1L, idxT, sinkT)
      }
      stages += "sink_read" -> time {
        spark.table(sinkT)
          .select(col("media_id"), col("afp"), col("batch_id"))
          .orderBy(col("media_id"))
          .write.format("noop").mode("overwrite").save()
      }
      // isolated pieces (not part of the row sum): decode alone for
      // batch 1's slice, and a bare 65-file-shaped append
      stages += "decode_b1_only" -> time {
        Multimodal.withAfp(media.filter(col("media_id") >= 60))
          .write.format("noop").mode("overwrite").save()
      }
      media.unpersist()
      stages.toSeq
    }
    // job-level attribution: record every job's wall time during the
    // LAST run so the per-batch cost decomposes into its ~10 jobs
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.remove(j.jobId)).foreach(t0 =>
            jobs.add(j.jobId -> (System.nanoTime() - t0)))
      })
    oneRun() // warm-up
    val r1 = oneRun()
    jobs.clear()
    val r2 = oneRun()
    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.sortBy(_._1)
    println(f"[agp] run2 jobs: ${js.size} total, " +
      f"sum ${js.map(_._2).sum / 1e9}%.2f s")
    js.foreach { case (id, ns) =>
      println(f"[agp]   job $id%3d ${ns / 1e9}%6.3f s") }
    val names = r1.map(_._1)
    println(f"[agp] ${"stage"}%-16s ${"min(2)"}%8s")
    names.zipWithIndex.foreach { case (n, i) =>
      println(f"[agp] $n%-16s ${math.min(r1(i)._2, r2(i)._2)}%8.2f")
    }
    val rowStages = Set("synth+ckpt", "seed_fp+create", "batch0",
      "batch1", "sink_read")
    println(f"[agp] row total (min-run sum) " +
      f"${names.zipWithIndex.filter(x => rowStages(x._1))
        .map(x => math.min(r1(x._2)._2, r2(x._2)._2)).sum}%8.2f")
    spark.stop()
  }
}
