package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc scale probe behind SURVEY §8.7/§8.12 — self-unions sf0.1 so
  * near-dup clusters multiply by construction, then times the cluster
  * operators whose runtime must track OUTPUT size (keep/drop rows are
  * corpus-linear) rather than input². Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ScaleProbe"` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def selfUnion(df: DataFrame, id: String, times: Int): DataFrame =
      (1 until times).foldLeft(df)((acc, i) =>
        acc.unionByName(df.withColumn(id, col(id) + lit(i * 1000000L))))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    for (x <- Seq(2, 8, 16)) {
      val d = selfUnion(docs, "doc_id", x)
      val n = time(s"simhashClusters ${x}x (${x * 5000} docs) [rows]") {
        graft.llm.Dedup.simhashClusters(d, "doc_id", "text").count()
      }
      println(s"[probe]   -> $n rows")
    }
    for (x <- Seq(2, 8, 16)) {
      val e = selfUnion(emb, "vec_id", x)
      val n = time(s"cosineClusters ${x}x (${x * 2000} vecs) [rows]") {
        graft.llm.Dedup.cosineClusters(e, "vec_id", "embedding", 0.95)
          .count()
      }
      println(s"[probe]   -> $n rows")
    }
    val d8 = selfUnion(docs, "doc_id", 8)
    val ds = time("dupSpanFraction 8x (40k docs) [rows]") {
      graft.llm.TextAnalysis.dupSpanFraction(d8, "doc_id", "text").count()
    }
    println(s"[probe]   -> $ds rows")
    val bs = time("budgetSelect 8x (40k docs) [selected]") {
      graft.llm.TextAnalysis.budgetSelect(d8, "doc_id", "text", 500000L)
        .filter(col("selected")).count()
    }
    println(s"[probe]   -> $bs selected")

    // ---- r6 additions: join operators + the degenerate budgetSelect ----
    // events scale by SHIFTING user_id too: more keys at constant per-key
    // history — the realistic 100 TB growth axis (a fixed key set with
    // ever-deeper history would measure per-key sort growth instead)
    val ev = Tables.load(spark, sfDir, "events") // nanos-ts aware loader
    def evUnion(times: Int): DataFrame =
      (1 until times).foldLeft(ev)((acc, i) =>
        acc.unionByName(ev
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L))))

    for (x <- Seq(2, 8, 16)) {
      val e = evUnion(x)
      val left = e.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.filter(pmod(col("event_id"), lit(2)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value").cast("decimal(18,6)")).cast("double").as("rv"))
      val n = time(s"asOf+tolerance ${x}x [rows]") {
        graft.operators.AsOfJoin.asOf(left, right, "user_id", "ts",
          Seq("rv"), tolerance = Some(expr("INTERVAL 30 MINUTES"))).count()
      }
      println(s"[probe]   -> $n rows")
    }
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"clickImpressionJoin ${x}x [rows]") {
        graft.streaming.Events.clickImpressionJoin(evUnion(x)).count()
      }
      println(s"[probe]   -> $n rows")
    }
    // constant-quality corpus: 100% of rows land in the crossing
    // histogram bucket — pre-r6 this was the single-partition-window
    // scale killer; post-fix it must grow like the normal corpus
    for (x <- Seq(2, 8, 16)) {
      val const = selfUnion(docs, "doc_id", x)
        .withColumn("text",
          lit("the quick brown fox jumps over the lazy dog again and again"))
      val n = time(s"budgetSelect const-quality ${x}x [selected]") {
        graft.llm.TextAnalysis.budgetSelect(const, "doc_id", "text",
          x * 30000L).filter(col("selected")).count()
      }
      println(s"[probe]   -> $n selected")
    }

    // ---- r6 late additions: decontaminate / novelty / PQ / z-order ----
    // decontaminate: corpus grows, benchmark FIXED (the real shape —
    // eval suites don't grow with the crawl). Expect corpus-linear.
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    for (x <- Seq(2, 8, 16)) {
      val d = selfUnion(docs, "doc_id", x)
      val n = time(s"decontaminate ${x}x vs fixed bench [flagged]") {
        graft.llm.Dedup.decontaminate(d, "doc_id", "text", bench, "text")
          .filter(col("contaminated")).count()
      }
      println(s"[probe]   -> $n flagged")
    }
    // novelty: HISTORY INDEX grows, batch fixed (daily increment vs
    // deepening history). The join moves the batch; expect growth bound
    // by index scan + matched rows, not batch re-hash.
    for (x <- Seq(2, 8, 16)) {
      val index = graft.llm.Dedup.minhashSignature(
        selfUnion(docs, "doc_id", x), "doc_id", "text", 3, 16)
      val n = time(s"minhashNovelty batch=5k vs ${x}x index [novel]") {
        graft.llm.Dedup.minhashNovelty(
          docs.select((col("doc_id") + 90000000L).as("doc_id"), col("text")),
          "doc_id", "text", index).filter(col("novel")).count()
      }
      println(s"[probe]   -> $n novel")
    }
    // PQ: train once on 1x, encode/search at corpus scale (the serving
    // shape). Encode is map-only; search = code scan + rank-pushdown
    // window + shortlist rerank.
    val pqModel = graft.llm.Similarity.pqTrain(
      emb.localCheckpoint(), "vec_id", "embedding", 8, 64)
    for (x <- Seq(2, 8, 16)) {
      val e = selfUnion(emb, "vec_id", x)
      val n = time(s"pqEncode ${x}x [rows]") {
        graft.llm.Similarity.pqEncode(e, "vec_id", "embedding", pqModel)
          .count()
      }
      println(s"[probe]   -> $n rows")
      val s = time(s"pqTopK ${x}x (5 queries) [rows]") {
        graft.llm.Similarity.pqTopK(e, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, pqModel, 100).count()
      }
      println(s"[probe]   -> $s rows")
    }
    // z-order write: one range exchange + in-partition sort — the
    // layout cost a deployment pays once per table build
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    for (x <- Seq(2, 8)) {
      val o = selfUnion(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")), "o_orderkey", x)
      time(s"writeZOrdered orders ${x}x") {
        graft.sources.Layout.writeZOrdered(o,
          s"/tmp/graft_zorder_probe_$x", Seq("o_custkey", "o_orderkey"))
      }
    }
    // gap-fill: events scale by MORE KEYS (user shift), so output ticks
    // scale with keys and runtime must track the spine, never keys²
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"gapFill ${x}x keys [ticks]") {
        graft.operators.GapFill.gapFill(evUnion(x), "user_id", "ts",
          "event_id", "value", stepSec = 600L).count()
      }
      println(s"[probe]   -> $n ticks")
    }
    // BPE base-stage pair counts: vocab-bound, so self-unioning the
    // corpus (same words, higher counts) must be nearly flat — the
    // word-frequency-table trick in one measurement
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"bpePairCounts ${x}x corpus [pairs]") {
        graft.llm.TextAnalysis.bpePairCounts(
          selfUnion(docs, "doc_id", x), "text").count()
      }
      println(s"[probe]   -> $n distinct pairs")
    }
    // gap-fill interpolation: same spine as LOCF plus the forward
    // frame — must stay output-linear (shared exchange, no second sort
    // cost blowup)
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"gapFill-interp ${x}x keys [ticks]") {
        graft.operators.GapFill.gapFill(evUnion(x), "user_id", "ts",
          "event_id", "value", 600L, "interpolate", None).count()
      }
      println(s"[probe]   -> $n ticks")
    }
    // BPE encode-to-ids: map-only projection, must be corpus-linear
    val encMerges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "i" -> "n")
    val encVocab = graft.llm.TextAnalysis.bpeVocab(
      (('a' to 'z') ++ ('0' to '9')).map(_.toString), encMerges)
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"bpeEncode ${x}x corpus [docs]") {
        graft.llm.TextAnalysis.bpeEncode(selfUnion(docs, "doc_id", x),
          "doc_id", "text", encMerges, encVocab).count()
      }
      println(s"[probe]   -> $n docs")
    }

    // ---- wave 6/7: hygiene + statistics operators ----
    // line dedup: self-union multiplies line duplication; runtime must
    // track the distinct-line table + reassembly (corpus-linear), the
    // duplicate multiplicity collapses at the first groupBy
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"dedupLines ${x}x corpus [docs]") {
        graft.llm.Dedup.dedupLines(selfUnion(docs, "doc_id", x),
          "doc_id", "text").count()
      }
      println(s"[probe]   -> $n docs")
    }
    // unigram LM: the model is vocab-bound (same words at any union
    // factor), scoring is corpus-linear
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"unigramScore ${x}x corpus [docs]") {
        graft.llm.TextAnalysis.unigramScore(selfUnion(docs, "doc_id", x),
          "doc_id", "text").count()
      }
      println(s"[probe]   -> $n docs")
    }
    // E-S sampling: TakeOrderedAndProject — k bounds the merge at any
    // input size, so wall time must be scan-bound
    for (x <- Seq(2, 8, 16)) {
      val d = selfUnion(docs, "doc_id", x)
        .withColumn("w", length(col("text")).cast("long") + 1)
      val n = time(s"weightedSample ${x}x corpus [k]") {
        graft.operators.WeightedSample.sample(d, "doc_id", col("w"), 100)
          .count()
      }
      println(s"[probe]   -> $n sampled")
    }
    // covariance: the exchange carries d(d+1)/2 partial rows at ANY
    // input size; runtime = the d^2-per-row outer-product map work
    for (x <- Seq(2, 8)) {
      val n = time(s"covariance ${x}x vectors [cells]") {
        graft.llm.Embeddings.covariance(selfUnion(emb, "vec_id", x),
          "embedding").count()
      }
      println(s"[probe]   -> $n cells")
    }
    // fuzzy join: both sides self-union (keys shifted) — candidate
    // volume grows with true matches, never all-pairs
    for (x <- Seq(2, 8)) {
      val l = selfUnion(docs, "doc_id", x)
      val r = selfUnion(docs, "doc_id", x)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text"))
      val n = time(s"fuzzyJoin ${x}x both sides [pairs]") {
        graft.llm.Dedup.fuzzyJoin(l, r, "doc_id", "text", 0.5).count()
      }
      println(s"[probe]   -> $n pairs")
    }

    // ---- round-7 late waves: graph, window, string-join operators ----
    // PageRank / LPA: nodes AND edges scale together (disjoint shifted
    // copies of the same graph) — per-iteration cost is one join + one
    // agg on graph keys; expect ~linear in |E|
    val prNodes = docs.select(pmod(col("doc_id"), lit(400)).as("id")).distinct()
    val prEdges = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(pmod(col("doc_id"), lit(400)).as("src"),
        pmod(col("doc_id") * col("doc_id") + 7, lit(400)).as("dst"))
      .distinct()
    for (x <- Seq(2, 8)) {
      val nn = selfUnion(prNodes, "id", x)
      val ee = (1 until x).foldLeft(prEdges)((acc, i) =>
        acc.unionByName(prEdges
          .withColumn("src", col("src") + lit(i * 1000000L))
          .withColumn("dst", col("dst") + lit(i * 1000000L))))
      val n = time(s"pageRank ${x}x graph, 10 iters [nodes]") {
        graft.operators.PageRank.pageRank(nn, "id", ee, iters = 10).count()
      }
      println(s"[probe]   -> $n nodes")
      val m = time(s"labelProp ${x}x graph, 4 iters [nodes]") {
        graft.operators.LabelProp.labelProp(nn, "id", ee,
          a = "src", b = "dst", iters = 4).count()
      }
      println(s"[probe]   -> $m nodes")
    }
    // kNN graph: copies get ROTATED vectors (rotation moves the sign-LSH
    // bucket) — the realistic "more distinct vectors" axis, not the
    // adversarial duplicate-stack (identical copies multiply bucket
    // population and candidate pairs quadratically BY CONSTRUCTION;
    // that is the output growing, not the algorithm degrading)
    for (x <- Seq(2, 8)) {
      val e = (1 until x).foldLeft(emb)((acc, i) =>
        acc.unionByName(emb
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding", expr(
            s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
              s"slice(embedding, 1, $i))"))))
      val n = time(s"knnGraph ${x}x distinct vectors [edges]") {
        graft.llm.Similarity.knnGraph(e, "vec_id", "embedding", 3).count()
      }
      println(s"[probe]   -> $n edges")
    }
    // edit-distance join: copies get a distinct 2-char suffix (dist 2
    // apart cross-copy, so output stays per-copy-linear); variants and
    // candidates must scale with distinct strings
    for (x <- Seq(2, 8)) {
      val names = docs.select(col("doc_id"),
        substring(col("text"), 1, 12).as("nm"))
      val u = (1 until x).foldLeft(names)((acc, i) =>
        acc.unionByName(names
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("nm", concat(col("nm"),
            lit(s"${('a' + i).toChar}${('a' + i).toChar}")))))
      val d = u.groupBy(col("nm")).agg(min(col("doc_id")).as("id"))
      val n = time(s"editDistJoin ${x}x distinct strings [pairs]") {
        graft.operators.EditDistJoin.selfJoin(d, "id", "nm").count()
      }
      println(s"[probe]   -> $n pairs")
    }
    // rolling trailing features: more keys at constant per-key history
    // (the evUnion axis) — per-key sort work constant, total linear
    for (x <- Seq(2, 8, 16)) {
      val n = time(s"rolling 7d ${x}x keys [rows]") {
        graft.operators.Rolling.trailing(
          evUnion(x).select(col("event_id"), col("user_id"), col("ts"),
            col("value")),
          "user_id", "ts", "value", 7 * 86400L).count()
      }
      println(s"[probe]   -> $n rows")
    }
    // exact AllPairs self-join (r8 PPJoin rewrite): self-union multiplies
    // near-dup density — the adversarial axis for candidate volume. The
    // r7 form (.distinct() on the pair set, no positional filter) was
    // 103.9 s at 1×; the PPJoin form must stay output-bound (the true
    // pair count IS quadratic in copies: x copies of a doc → x·(x+1)/2
    // ordered pairs per original near-dup pair)
    for (x <- Seq(1, 2, 4)) {
      val d = selfUnion(docs, "doc_id", x)
      val n = time(s"allPairs t=0.7 ${x}x (${x * 5000} docs) [pairs]") {
        graft.llm.Dedup.allPairs(d, "doc_id", "text", 0.7).count()
      }
      println(s"[probe]   -> $n pairs")
    }
    // exact cross-corpus join: left fixed, right grows — candidate and
    // output volume scale with the right side; must stay output-bound
    for (x <- Seq(1, 2, 4)) {
      val r = selfUnion(docs, "doc_id", x)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      val n = time(s"allPairsJoin t=0.7 5k x ${x * 5000} [pairs]") {
        graft.llm.Dedup.allPairsJoin(docs, r, "doc_id", "text", 0.7)
          .count()
      }
      println(s"[probe]   -> $n pairs")
    }
    // ADVERSARIAL corpus for the dense-arm signature guard (r9, r8
    // verdict #1): small vocabulary (2,000 synthetic tokens — PASSES the
    // vocab gate) but ~100k DISTINCT random 12-token sets (FAILS the
    // signature gate: D ≈ n ≫ 65,536). Unguarded, the dense arm would
    // broadcast all ~100k signatures and sweep 5·10⁹ popcount pairs for
    // an empty result; the guard must route this to the prefix arm
    // (plan-asserted: no BNLJ) and the prefix arm must complete —
    // uniform random sets have bucket-bound candidate volume even
    // though every token is "frequent".
    {
      val n = 100000L
      val adv = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i =>
          concat(lit("w"), pmod(xxhash64(col("id") + lit(i * 7919)),
            lit(2000)))): _*).as("text"))
      val q = graft.llm.Dedup.allPairs(adv, "doc_id", "text", 0.8)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "signature guard failed to reject the adversarial corpus")
      val c = time(s"allPairs ADVERSARIAL 2k vocab, $n distinct sets") {
        q.count()
      }
      println(s"[probe]   -> $c pairs (prefix-arm fallback engaged)")
    }
    // tfidfPairs (r9): self-union multiplies identical weight vectors —
    // the dense arm's distinct-signature count stays FLAT while docs
    // grow, so the sweep cost is constant and only the output-bound
    // expansion grows (x copies → x² pairs per base pair)
    for (x <- Seq(1, 2, 4)) {
      val d = selfUnion(docs, "doc_id", x)
      val n = time(s"tfidfPairs t=0.9 ${x}x (${x * 5000} docs) [pairs]") {
        graft.llm.Dedup.tfidfPairs(d, "doc_id", "text", 0.9).count()
      }
      println(s"[probe]   -> $n pairs")
    }
    // ADVERSARIAL corpus for tfidfPairs' dense-arm guard — the same
    // 2k-vocab / ~100k-distinct-sets corpus that pins allPairs': must
    // route to the prefix arm (no BNLJ) and complete there
    {
      val n = 100000L
      val adv = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i =>
          concat(lit("w"), pmod(xxhash64(col("id") + lit(i * 7919)),
            lit(2000)))): _*).as("text"))
      val q = graft.llm.Dedup.tfidfPairs(adv, "doc_id", "text", 0.9)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "tfidf signature guard failed to reject the adversarial corpus")
      val c = time(s"tfidfPairs ADVERSARIAL 2k vocab, $n distinct sets") {
        q.count()
      }
      println(s"[probe]   -> $c pairs (prefix-arm fallback engaged)")
    }
    // substringSpans (r9): self-union turns EVERY position duplicated
    // (each copy repeats every gram) — the worst case for span volume;
    // positions stay linear in corpus, spans linear in docs
    for (x <- Seq(1, 2, 4)) {
      val d = selfUnion(docs, "doc_id", x)
      val n = time(s"substringSpans k=64 ${x}x (${x * 5000} docs) [spans]") {
        graft.llm.Dedup.substringSpans(d, "doc_id", "text", 64).count()
      }
      println(s"[probe]   -> $n spans")
    }
    // jw join (r9): copies grow name cliques — candidates stay
    // distinct-name-bound (flat), output grows quadratically in copies
    for (x <- Seq(1, 2, 4)) {
      val p = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
      val u = (1 until x).foldLeft(p.select(col("p_partkey"), col("p_name")))(
        (acc, i) => acc.unionByName(p.select(
          (col("p_partkey") + lit(i * 10000000L)).as("p_partkey"),
          col("p_name"))))
      val n = time(s"jwJoin t=0.935 ${x}x (${x * 20000} parts) [pairs]") {
        graft.operators.JaroWinklerJoin.selfJoin(
          u, "p_partkey", "p_name", 0.935).count()
      }
      println(s"[probe]   -> $n pairs")
    }
    // triangles (r9): order-subset fraction doubles edge density each
    // step — wedge volume is Θ(Σ outdeg²), the inherent exact-count
    // cost; the curve documents how density, not node count, drives it
    for (m <- Seq(16, 8, 4)) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .filter(col("l_orderkey") % m === 0)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      val n = time(s"triangles orders%$m [nodes]") {
        graft.operators.Triangles.perNode(edges, "src", "dst")
          .filter(col("n_tri") > 0).count()
      }
      println(s"[probe]   -> $n nodes in triangles")
    }
    // SemDeDup: corpus doubles, nlist fixed → per-cell quadratic work
    // grows 4x per doubling; raising nlist with the corpus is the
    // documented scale lever, pinned here by the nlist=64 row
    for ((x, nl) <- Seq((2, 32), (4, 32), (4, 64))) {
      val e = selfUnion(emb, "vec_id", x)
      val n = time(s"semanticDedup ${x}x (${x * 2000} vecs) nlist=$nl [dropped]") {
        graft.llm.Dedup.semanticDedup(e, "vec_id", "embedding", nl, 0.95)
          .filter(!col("kept")).count()
      }
      println(s"[probe]   -> $n dropped")
    }
    spark.stop()
  }
}
