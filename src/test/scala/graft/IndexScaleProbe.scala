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
    println(f"[isp] ${"index size"}%10s ${"literal"}%8s ${"join"}%8s")
    for (n <- Seq(1000, 8000, 32000, 64000)) {
      val table = idx(n)
      val sigs = table.as[Long].collect().toSeq
      def runLit(): Unit = graft.streaming.Events
        .imageNoveltyStream(media, sigs)
        .write.format("noop").mode("overwrite").save()
      def runJoin(): Unit = graft.streaming.Events
        .imageNoveltyJoin(media, table)
        .write.format("noop").mode("overwrite").save()
      runLit(); runJoin() // warm-up
      val tl = math.min(time(runLit()), time(runLit()))
      val tj = math.min(time(runJoin()), time(runJoin()))
      println(f"[isp] $n%10d $tl%8.2f $tj%8.2f")
    }
    spark.stop()
  }
}
