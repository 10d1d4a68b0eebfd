package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-size scaling probe for the novelty forms (SURVEY §8.21): a
  * FIXED arrival batch tested against signature indexes of growing
  * size — the plan-literal form's cost grows with the index (plan
  * construction/analysis embeds it), the join form's stays ~flat (the
  * index is data on the other side of an equi-join). Run:
  * `sbt "Test/runMain graft.IndexScaleProbe"` */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .limit(2000)
    val media = graft.llm.Multimodal.syntheticContentImages(docs)
      .localCheckpoint()
    // synthetic signature indexes: iid 64-bit values (spread like real
    // perceptual-hash corpora), deterministic
    def idx(n: Int): DataFrame =
      spark.range(n.toLong).select(xxhash64(col("id")).as("sig"))
        .localCheckpoint()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"[isp] ${"index size"}%10s ${"literal"}%8s ${"join"}%8s ${"bucketed"}%9s")
    for (n <- Seq(1000, 8000, 32000, 64000, 256000, 1000000)) {
      val table = idx(n)
      // literal arm only under the plan-size guard
      val tl: Option[Double] =
        if (n <= graft.streaming.Events.MaxLiteralIndexSigs) {
          val sigs = table.as[Long].collect().toSeq
          def runLit(): Unit = graft.streaming.Events
            .imageNoveltyStream(media, sigs)
            .write.format("noop").mode("overwrite").save()
          runLit() // warm-up
          Some(math.min(time(runLit()), time(runLit())))
        } else None
      def runJoin(): Unit = graft.streaming.Events
        .imageNoveltyJoin(media, table)
        .write.format("noop").mode("overwrite").save()
      runJoin() // warm-up
      val tj = math.min(time(runJoin()), time(runJoin()))
      // bucketed-table arm: the ingest loop's per-batch probe shape —
      // band-exploded index persisted bucketed by band_key, probed via
      // noveltyBandedJoin (index side comes straight off the scan)
      val bktT = s"isp_idx_$n"
      spark.sql(s"DROP TABLE IF EXISTS $bktT")
      graft.streaming.Events.createSignatureIndex(spark, bktT, table,
        "sig")
      val signed = graft.llm.Multimodal.withDhash(media).localCheckpoint()
      def runBkt(): Unit = graft.streaming.Events
        .noveltyBandedJoin(signed, "dhash", spark.table(bktT), 3)
        .write.format("noop").mode("overwrite").save()
      runBkt() // warm-up
      val tb = math.min(time(runBkt()), time(runBkt()))
      spark.sql(s"DROP TABLE IF EXISTS $bktT")
      println(f"[isp] $n%10d ${tl.map(t => f"$t%8.2f").getOrElse("       -")}%s $tj%8.2f $tb%9.2f")
    }
    spark.stop()
  }
}
