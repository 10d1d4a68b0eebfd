package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 — recall floor measurement for the IVF×JL composition
  * ([[graft.llm.Similarity.ivfTopKRp]]), run BEFORE the gate in
  * sim_ivf_rp_topk / LlmSpec is chosen (the sim_pq_topk convention:
  * measure the floor on the shipped shapes, gate with margin below
  * it). Sweeps nprobe × shortlist on sf0.001 and sf0.01 embeddings
  * with the shipped query sets, alongside the plain IVF recall at the
  * same nprobe for reference. Run:
  * `sbt "Test/runMain graft.RpIvfProbe"` */
object RpIvfProbe {
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
    import graft.llm.Similarity
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
        .localCheckpoint()
      val q = e.filter(col("vec_id") < 5)
      val cents = Similarity.ivfTrain(e, "vec_id", "embedding", 32)
      for (dOut <- Seq(16, 32); nprobe <- Seq(12, 16);
           shortlist <- Seq(100, 200)) {
        val rec = Similarity.ivfRpRecall(e, q, "vec_id", "embedding",
            10, cents, nprobe, shortlist, dOut)
          .select(col("recall")).collect().map(_.getDouble(0))
        println(f"[rpivf] $sf dOut=$dOut%2d nprobe=$nprobe%2d " +
          f"short=$shortlist%3d  " +
          f"min=${rec.min}%.2f mean=${rec.sum / rec.length}%.2f")
      }
      val ref = Similarity.ivfRecall(e, q, "vec_id", "embedding", 10,
          cents, 12)
        .select(col("recall")).collect().map(_.getDouble(0))
      println(f"[rpivf] $sf plain ivf nprobe=12   " +
        f"min=${ref.min}%.2f mean=${ref.sum / ref.length}%.2f")
    }
    spark.stop()
  }
}
