package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-timing probe for the dd_allpairs_join variance investigation
  * (r9): times each stage of the dense arm separately to locate the
  * bimodal 10s/35s behavior. Run:
  * `sbt "Test/runMain graft.ApProbe"` */
object ApProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ap] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[ap] ---- round $round ----")
      val d = Tables.load(spark, dir, "documents")
      val right = d.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zz"),
          pmod(col("doc_id"), lit(5)).cast("string")).as("text"))
      val q = time("construct (probes+checkpoints)") {
        graft.llm.Dedup.allPairsJoin(d, right, "doc_id", "text", 0.7)
      }
      time("execute (noop)") {
        q.write.format("noop").mode("overwrite").save()
      }
      if (args.nonEmpty) time("release") {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    spark.stop()
  }
}
