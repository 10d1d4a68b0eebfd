package graft

import org.apache.spark.sql.SparkSession

/** r15 (r14 verdict #1) — the dd_semantic board-elevation A/B probe.
  *
  * The r14 verdict observed dd_semantic 3.70/3.84 s in both r13 runs vs
  * 4.83/4.97 s in both r14 runs with BYTE-IDENTICAL code+query (the
  * r13..r14 diff on SparkEntry/Dedup/Similarity is insertions only),
  * and hypothesized run-order/JVM-state contamination from the five
  * new codegen-heavy neighbors that now run immediately around it in
  * Bench's name-sorted order. This main tests that hypothesis
  * directly, in one JVM:
  *
  *   phase A: dd_semantic timed N times to steady state (cold JVM)
  *   phase B: the five r14-new rows run once each (the suspects)
  *   phase C: dd_semantic timed N times again (post-neighbor state)
  *
  * If C's steady state sits above A's, JVM-state contamination is
  * real and the mechanism is in whatever B changed (JIT code cache,
  * metaspace, codegen cache eviction). If C ≈ A, the board elevation
  * is NOT neighbor-induced and must be box- or phase-level. Each
  * timing prints the janino compile count/time delta
  * (CodegenMetrics — Spark's own dropwizard source) and the JVM JIT
  * total compile-time delta, so compile work is attributed per run
  * rather than guessed. Run:
  * `sbt "Test/runMain graft.BoardOrderProbe [sfDir]"` */
object BoardOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    import scala.jdk.CollectionConverters._
    def codeCacheUsedMb: Double =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / 1e6
    def metaspaceUsedMb: Double =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName == "Metaspace")
        .map(_.getUsage.getUsed).sum / 1e6
    val janinoTime = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    def janinoCount: Long = janinoTime.getCount

    def run(name: String, tag: String): Double = {
      val jc0 = janinoCount; val jt0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[order] $tag%-10s $name%-28s $dt%6.2f s  " +
        f"janino+${janinoCount - jc0}%3d  " +
        f"jit+${(jit.getTotalCompilationTime - jt0) / 1000.0}%5.1f s  " +
        f"codecache ${codeCacheUsedMb}%5.1f MB  " +
        f"metaspace ${metaspaceUsedMb}%5.1f MB")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      dt
    }

    val N = 6
    val a = (1 to N).map(i => run("dd_semantic", s"A$i"))
    val newRows = Seq("dd_key_novelty_grow", "dd_minhash_novelty_collapse",
      "dd_semantic_novelty_collapse", "dd_semantic_rp", "sim_rp_topk")
    newRows.foreach(n => run(n, "B"))
    val c = (1 to N).map(i => run("dd_semantic", s"C$i"))
    // steady state = min of the last 3 (the bench convention is min of
    // 2 after 1 warm-up; the longer tail here absorbs slow JIT ramps)
    val aS = a.takeRight(3).min; val cS = c.takeRight(3).min
    println(f"[order] steady A ${aS}%.2f s  steady C ${cS}%.2f s  " +
      f"C/A ${cS / aS}%.2fx  " +
      (if (cS / aS > 1.15) "NEIGHBOR CONTAMINATION confirmed"
       else "no neighbor effect — elevation is box/phase-level"))
    spark.stop()
  }
}
