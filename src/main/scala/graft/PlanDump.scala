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
  * dumped plan is the bench plan. Construction side effects (novelty
  * ingest rows create+populate their index/sink tables) run for real;
  * the dump is the explain of the query's returned frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <names,csv>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
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
        case None => System.err.println(s"[plandump] no such query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
            println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
