package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Stage diagnostic for the weighted vs Jaccard prefix arms on the
  * adversarial corpus: executes each, then dumps every physical
  * operator's numOutputRows metric — localizes whether residual cost
  * is candidate volume (join output) or per-candidate work.
  * Run: `sbt "Test/runMain graft.TfDiag"` */
object TfDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 100000L
    val adv = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id") + lit(i * 7919)),
          lit(2000)))): _*).as("text"))

    // capture the EXECUTED QueryExecution (the write action plans its
    // own QE; df.queryExecution is a fresh copy with zeroed metrics)
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { lastQe = qe }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      lastQe = null
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener fires asynchronously after the action returns
      var waited = 0
      while (lastQe == null && waited < 100) { Thread.sleep(100); waited += 1 }
      println(f"[diag] ==== $name: ${dt}%.1f s ====")
      def walk(p: SparkPlan, depth: Int): Unit = {
        val rows = p.metrics.get("numOutputRows").map(_.value)
        val extra = p.metrics.filter { case (k, _) =>
          k == "spillSize" || k == "numMatchedRows" }
          .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println(f"[diag] ${"  " * depth}${p.getClass.getSimpleName}%-30s" +
          f" rows=${rows.getOrElse(-1L)}%12d $extra")
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan, depth + 1)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
            walk(r.child, depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      if (lastQe != null) walk(lastQe.executedPlan, 0)
    }
    dump("tfidf t=0.9",
      graft.llm.Dedup.tfidfPairs(adv, "doc_id", "text", 0.9))
    dump("jaccard t=0.9",
      graft.llm.Dedup.allPairs(adv, "doc_id", "text", 0.9))
    spark.stop()
  }
}
