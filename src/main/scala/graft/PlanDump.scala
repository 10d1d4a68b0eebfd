package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Plan-dump main (optimization-round measurement tooling, guide §1.1/§7.2):
  * writes `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name>_<suffix>.txt`, so before/after plan-shape claims
  * (Exchange count, join strategy, PushedFilters, codegen spans) are
  * checkable artifacts instead of prose.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> name1,name2,...
  * Session config mirrors Bench (same master/shuffle partitions) so the
  * dumped plan is the bench plan — with one caveat (r17 ADVICE): the
  * dump is the INITIAL static plan (`AdaptiveSparkPlan isFinalPlan=
  * false`, unexecuted); AQE can change join strategy/partitioning at
  * bench runtime, so before/after comparisons are consistent but
  * absolute plan-shape claims should be cross-checked when they ride
  * on an AQE decision. Construction side effects (novelty ingest rows
  * create+populate their index/sink tables) run for real; the dump is
  * the explain of the query's returned frame. Exits non-zero when any
  * requested name is unknown or throws (r17 ADVICE — a partial dump
  * must be detectable by the invoking script).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <names,csv>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    var failures = 0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None =>
          System.err.println(s"[plandump] no such query: $n")
          failures += 1
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
            println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
            failures += 1
          }
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

/** Plan-shape survey over EVERY declared query (guide §1.1: capture the
  * plan shape — Exchange count, join strategy, pushed filters, codegen
  * spans — before optimizing): one line per query, written to the file
  * given as arg(0). Side-effectful rows (materializations, novelty
  * ingests) run their construction jobs exactly as Verify/Bench do;
  * the surveyed plan is the declared query's returned frame.
  *
  * Usage: runMain graft.PlanSurvey <outFile>
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: PlanSurvey <outFile>")
    // fail on an unwritable output path BEFORE the (expensive) survey
    // of all queries, not after (r17 ADVICE)
    Option(Paths.get(args(0)).toAbsolutePath.getParent)
      .foreach(Files.createDirectories(_))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def count(txt: String, token: String): Int =
      token.r.findAllMatchIn(txt).size
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      try {
        val txt = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        // Count NODES via the detail-section headers "(nn) Operator" —
        // formatted mode prints every node twice (tree + details), so a
        // bare substring count would double. "Exchange" alone = shuffle
        // exchanges; BroadcastExchange counted separately (a broadcast
        // is deliberately NOT a shuffle).
        val sh = count(txt, "(?m)^\\(\\d+\\) Exchange\\b")
        val bc = count(txt, "(?m)^\\(\\d+\\) BroadcastExchange")
        val joins = Seq("SortMergeJoin", "BroadcastHashJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> count(txt, s"(?m)^\\(\\d+\\) $j"))
          .filter(_._2 > 0)
          .map { case (j, c) => s"$j=$c" }.mkString(",")
        val pushed = count(txt, "PushedFilters: \\[[^\\]]")
        f"$n%-34s exch=$sh%-3d bcast=$bc%-3d pushedFilterScans=$pushed%-3d joins=[$joins]"
      } catch { case e: Throwable =>
        f"$n%-34s FAILED: ${e.getMessage}"
      }
    }
    Files.writeString(Paths.get(args(0)),
      lines.mkString("", "\n", "\n"))
    println(s"[plansurvey] wrote ${args(0)} (${lines.size} rows)")
    spark.stop()
  }
}
