package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Dev probe: PQ recall across scales/shortlists (not a test; run with
  * Test/runMain graft.PqProbe). Informs the sim_pq_topk gate threshold. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.load(spark, sf, "embeddings").localCheckpoint()
      for ((m, ksub) <- Seq((4, 16), (8, 16), (4, 64), (8, 64))) {
        val model = Similarity.pqTrain(e, "vec_id", "embedding", m, ksub)
        for (short <- Seq(50, 100, 500)) {
          val rec = Similarity.pqRecall(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", 10, model, short).collect()
          println(s"PROBE SF=$sf m=$m ksub=$ksub short=$short recalls=" +
            rec.map(_.getDouble(1)).mkString(","))
        }
      }
      val cent = Similarity.ivfTrain(e, "vec_id", "embedding", nlist = 32)
      val model = Similarity.pqTrain(e, "vec_id", "embedding", 8, 64)
      for (nprobe <- Seq(12, 16); short <- Seq(100, 200)) {
        val rec = Similarity.ivfPqRecall(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, cent, model, nprobe, short).collect()
        println(s"PROBE SF=$sf IVFPQ nprobe=$nprobe short=$short recalls=" +
          rec.map(_.getDouble(1)).mkString(","))
      }
    }
  }
}
