package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Dev probe: where does decontaminateSet's time go at sf0.1. */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bench = d.filter(pmod(col("doc_id"), lit(20)) === 0)
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dp] $l%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (_ <- 0 until 2) {
      val set = time("contaminationSet") {
        Dedup.contaminationSet(bench, "text")
      }
      println(s"[dp]   set size ${set.length}")
      time("decontaminateSet eval") {
        Dedup.decontaminateSet(d, "doc_id", "text", set)
          .write.format("noop").mode("overwrite").save()
      }
      time("join form") {
        Dedup.decontaminate(d, "doc_id", "text", bench, "text")
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
