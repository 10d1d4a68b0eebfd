package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Job-level decomposition of dd_tfidf_join on the real sf0.1 corpus
  * (r18): tfidfJoin runs several EAGER actions during construction
  * (side counts, the dfc/dense checkpoints, the vocab and density
  * probes) before the final sweep executes under the noop sink — a
  * single end-to-end number cannot say which phase to optimize. The
  * listener prints every job with its wall time; job order maps to
  * construction order. Run: `sbt "Test/runMain graft.TfJoinProbe"` */
object TfJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.get(je.jobId)
        println(f"[tfjoin] job ${je.jobId}%3d " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    for (round <- 1 to 2) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 4 < 2)
      val right = d.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zz"),
          pmod(col("doc_id"), lit(5)).cast(StringType)).as("text"))
      val t0 = System.nanoTime()
      println(s"[tfjoin] === round $round: construction ===")
      val q = graft.llm.Dedup.tfidfJoin(d, right, "doc_id", "text",
        threshold = 0.9)
      println(f"[tfjoin] construction took " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      println(f"[tfjoin] final sweep took " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
