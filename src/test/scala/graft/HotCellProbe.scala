package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** r16 (r15 verdict #1) — the within-cell semantic-dedup hot-cell skew
  * probe. k-means packs exact-duplicate boilerplate embeddings into ONE
  * cell regardless of nlist, so the naive within-cell pair join is
  * Σ|cell|² with a data-dependent hot cell; the rep-collapse form
  * (dedupAssigned since r16) joins one representative per distinct
  * (cell, vector), so a hot exact-duplicate cluster contributes ONE
  * rep. This probe plants a synthetic hot cell (h identical copies of
  * one sf0.1 vector on top of the full sf0.1 corpus) and times both
  * forms as h grows: the naive form must scale ~h², the rep form must
  * stay flat.
  *
  * r17 (r16 verdict #1) — the JITTERED arm: h DISTINCT near-identical
  * copies (v0 + i·ε on one component — the timestamps-in-boilerplate
  * embedding shape) land in the same cell but collapse to NOTHING
  * under the rep group-by, so the r16 rep form is back to ~h² in
  * distinct-vector space. The salt split (maxCellGroups) bounds it at
  * ~h·cap: the probe times the UNSPLIT rep form (cap disabled) vs the
  * split form (the shipped default — the probe's h crosses the 8192
  * default, so the default path IS the split path) as h grows. Run:
  * `sbt "Test/runMain graft.HotCellProbe"` → archive the [probe] lines
  * as test_archive/hot_cell_probe_r{N}.txt */
object HotCellProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  ($r%d kept)")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", 32)
    val v0 = emb.orderBy(col("vec_id")).limit(1).select(col("embedding"))

    def corpus(hot: Int): DataFrame = emb
      .unionByName(spark.range(hot).crossJoin(v0)
        .select((col("id") + 1000000L).as("vec_id"), col("embedding")))
      .localCheckpoint()

    // steady-state: run each size twice, report the second
    for (h <- Seq(1000, 10000, 100000); pass <- 1 to 2) {
      val c = corpus(h)
      val assigned = Similarity.ivfAssign(c, "vec_id", "embedding", cents)
        .localCheckpoint()
      if (h <= 10000) {
        val t0 = System.nanoTime()
        val kept = Dedup.dedupAssignedPairJoin(assigned, "vec_id",
          "embedding", 0.95).filter(col("kept")).count()
        if (pass == 2)
          println(f"[probe] naive pair join  hot=$h%-7d ${
            (System.nanoTime() - t0) / 1e9}%8.2f s  ($kept%d kept)")
      } else if (pass == 2)
        println(s"[probe] naive pair join  hot=$h  SKIPPED " +
          "(10^10 candidate pairs; the 10k point already shows ~h^2)")
      val t1 = System.nanoTime()
      val kept2 = Dedup.semanticDedup(c, "vec_id", "embedding", cents,
        0.95).filter(col("kept")).count()
      if (pass == 2)
        println(f"[probe] rep-collapse     hot=$h%-7d ${
          (System.nanoTime() - t1) / 1e9}%8.2f s  ($kept2%d kept)")
    }

    // ---- r17 jittered arm (r16 verdict #1): h DISTINCT near-identical
    // copies — v0 with component 0 shifted by i·1e-6 (pairwise cosine
    // ≈ 1, every vector unique) — all land in v0's cell but the rep
    // group-by collapses NOTHING, so the unsplit rep form is ~h² in
    // distinct-vector space. The salt split bounds work at ~h·cap.
    def jittered(hot: Int): DataFrame = emb
      .unionByName(spark.range(hot).crossJoin(v0)
        .select((col("id") + 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0,
              (x + col("id").cast("double") * lit(1e-6)).cast("float"))
              .otherwise(x)).as("embedding")))
      .localCheckpoint()
    for (h <- Seq(1000, 10000, 100000); pass <- 1 to 2) {
      val c = jittered(h)
      val assigned = Similarity.ivfAssign(c, "vec_id", "embedding", cents)
        .localCheckpoint()
      // unsplit rep form (cap disabled): the r16 shape — must grow ~h²
      // in distinct-vector space; the 100k point is ~10^10 pairs,
      // skipped like the naive arm above
      if (h <= 10000) {
        val t0 = System.nanoTime()
        val kept = Dedup.dedupAssigned(assigned, "vec_id", "embedding",
            0.95, maxCellGroups = Int.MaxValue)
          .filter(col("kept")).count()
        if (pass == 2)
          println(f"[probe] rep UNSPLIT jitter=$h%-7d ${
            (System.nanoTime() - t0) / 1e9}%8.2f s  ($kept%d kept)")
      } else if (pass == 2)
        println(s"[probe] rep UNSPLIT jitter=$h  SKIPPED " +
          "(10^10 rep pairs; the 10k point already shows ~h^2)")
      // the SHIPPED path (public semanticDedup, default cap 8192 +
      // pivot peel): identical to unsplit below the cap; above it the
      // peel resolves the clique EXACTLY against the 64 smallest-id
      // groups (v0's original row is one — the real boilerplate
      // shape), ~h·64 pair work, with the salted join left only the
      // empty residual
      val t1 = System.nanoTime()
      val kept1 = Dedup.semanticDedup(c, "vec_id", "embedding", cents,
        0.95).filter(col("kept")).count()
      if (pass == 2)
        println(f"[probe] rep default     jitter=$h%-7d ${
          (System.nanoTime() - t1) / 1e9}%8.2f s  ($kept1%d kept)")
      // SALT-ONLY arm (pivotWidth = 0): the bound without the peel —
      // ~h·cap pair work, ceil(h/cap) clique reps kept
      val t2 = System.nanoTime()
      val kept2 = Dedup.dedupAssigned(assigned, "vec_id", "embedding",
          0.95, maxCellGroups = 8192, pivotWidth = 0)
        .filter(col("kept")).count()
      if (pass == 2)
        println(f"[probe] rep salt-only   jitter=$h%-7d ${
          (System.nanoTime() - t2) / 1e9}%8.2f s  ($kept2%d kept)")
      // tight cap isolates the salt scaling: ~h·1024 pair work
      val t3 = System.nanoTime()
      val kept3 = Dedup.dedupAssigned(assigned, "vec_id", "embedding",
          0.95, maxCellGroups = 1024, pivotWidth = 0)
        .filter(col("kept")).count()
      if (pass == 2)
        println(f"[probe] rep salt=1024   jitter=$h%-7d ${
          (System.nanoTime() - t3) / 1e9}%8.2f s  ($kept3%d kept)")
    }

    // ---- r17 (second session): the INTRA-BATCH collapse twin
    // (Events.collapseByVector — connected components in
    // distinct-vector space) under the same jittered hot cell. The
    // unsplit hazard here is WORSE than dedupAssigned's: every clique
    // pair qualifies, so the edge LIST itself is ~h²/2 rows — and
    // before the r17 hash-space emit, each row carried BOTH full
    // vectors (~2 KB at dim 256): the first run of this arm sat 25+
    // min in a single-thread 4.1 GiB+/partition localCheckpoint at
    // h = 10k (~100 GB of edges through one join key). Hash-space
    // edges are 16 bytes/row, which makes the 10k unsplit point
    // measurable — but it still evaluates ~5·10⁷ cosines through one
    // join key and materializes ~5·10⁷ edges, hence ~h²; 100k stays
    // skipped. The shipped default (cap 8192 + pivot peel) emits
    // ~width·h star edges instead and must stay near-linear. Kept
    // counts printed for the exactness check: the clique resolves to
    // ONE rep iff its lexicographic-min vector (v0 itself) is
    // pivot-covered.
    for (h <- Seq(1000, 10000, 100000); pass <- 1 to 2) {
      val c = jittered(h)
      if (h <= 10000) {
        val t0 = System.nanoTime()
        val kept = graft.streaming.Events.collapseByVector(c, "embedding",
            cents, 0.95, maxCellVectors = Int.MaxValue).count()
        if (pass == 2)
          println(f"[probe] cbv UNSPLIT jitter=$h%-7d ${
            (System.nanoTime() - t0) / 1e9}%8.2f s  ($kept%d kept)")
      } else if (pass == 2)
        println(s"[probe] cbv UNSPLIT jitter=$h  SKIPPED " +
          "(~5*10^9 pairs/edges through one join key; the 10k point " +
          "already shows ~h^2)")
      val t1 = System.nanoTime()
      val kept1 = graft.streaming.Events.collapseByVector(c, "embedding",
        cents, 0.95).count()
      if (pass == 2)
        println(f"[probe] cbv default jitter=$h%-7d ${
          (System.nanoTime() - t1) / 1e9}%8.2f s  ($kept1%d kept)")
    }
    spark.stop()
  }
}
