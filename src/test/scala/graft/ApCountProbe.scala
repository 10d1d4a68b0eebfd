package graft

import org.apache.spark.sql.SparkSession

/** r16 — output-row decomposition for dd_allpairs / dd_containment,
  * which first made the sf1 mini-board cut this round at 32.8×/30.3×:
  * on the 10×-shifted corpus every TEXT repeats 10×, so near-dup
  * cliques grow 10× and their PAIR output ~100× by construction (the
  * dd_allpairs_join/op_jw_cross precedent — their `_reps` siblings are
  * the scale path). This probe archives the measured output counts so
  * the exclusion note is a recomputation, not an assertion. Run:
  * `sbt "Test/runMain graft.ApCountProbe"` */
object ApCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17 (r16 verdict #2): dd_containment_join — the cross-corpus
    // form — debuted on the r16 sf1 board at 6.7x without an archived
    // output-count adjudication; it joins the run so the counts are
    // recomputed, not asserted. (Sf1Probe now auto-annotates any >5x
    // row with its output ratio, so future debuts self-adjudicate.)
    for (q <- Seq("dd_allpairs", "dd_containment", "dd_containment_join")) {
      val a = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      val b = SparkEntry.queries(q)(spark, "/tmp/graft_sf1").count()
      println(f"[probe] $q%-18s output rows sf0.1=$a%10d sf1=$b%12d " +
        f"ratio=${b.toDouble / a}%6.1fx")
    }
    spark.stop()
  }
}
