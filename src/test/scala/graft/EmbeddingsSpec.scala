package graft

import org.apache.spark.sql.functions._
import graft.llm.Embeddings

/** Covariance / PCA over embedding columns: hand-computed moments, the
  * eigen contract of power iteration, and the map-only projection. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def tiny = Seq(
    (1L, Array(1f, 2f)), (2L, Array(3f, 4f)), (3L, Array(5f, 9f)))
    .toDF("vec_id", "embedding")

  test("covariance: hand-computed 2x2 sample covariance") {
    // means (3,5); dev_x = (-2,0,2), dev_y = (-3,-1,4):
    // cov_xx = (4+0+4)/2 = 4; cov_xy = (6+0+8)/2 = 7; cov_yy = (9+1+16)/2 = 13
    val got = Embeddings.covariance(tiny, "embedding")
      .orderBy($"i", $"j").as[(Int, Int, Double)].collect().toSeq
    assert(got === Seq((0, 0, 4.0), (0, 1, 7.0), (1, 1, 13.0)))
  }

  test("covariance folds IEEE negative zero (text comparators see -0.0)") {
    // two anti-correlated-but-tiny dims engineered to round to zero
    val df = Seq(Array(1e-9f, -1e-9f), Array(-1e-9f, 1e-9f), Array(0f, 0f))
      .toDF("embedding")
    val covs = Embeddings.covariance(df, "embedding")
      .as[(Int, Int, Double)].collect()
    covs.foreach { case (_, _, c) =>
      assert(java.lang.Double.doubleToRawLongBits(c) !=
        java.lang.Double.doubleToRawLongBits(-0.0d), s"negative zero leaked")
    }
  }

  test("covarianceMatrix is symmetric and matches the triangle rows") {
    val m = Embeddings.covarianceMatrix(tiny, "embedding")
    assert(m.length === 2 && m(0)(1) === m(1)(0))
    assert(math.abs(m(0)(0) - 4.0) < 1e-9 && math.abs(m(0)(1) - 7.0) < 1e-9
      && math.abs(m(1)(1) - 13.0) < 1e-9)
  }

  test("pca1: power iteration converges to the dominant eigenpair") {
    val (v, lambda) = Embeddings.pca1(tiny, "embedding")
    // C = [[4,7],[7,13]]: tr 17, det 3 -> lambda_max = (17+sqrt(277))/2
    val expected = (17.0 + math.sqrt(17.0 * 17.0 - 4.0 * 3.0)) / 2
    assert(math.abs(lambda - expected) < 1e-6)
    // eigen contract: C v = lambda v componentwise
    val cv0 = 4.0 * v(0) + 7.0 * v(1)
    val cv1 = 7.0 * v(0) + 13.0 * v(1)
    assert(math.abs(cv0 - lambda * v(0)) < 1e-6)
    assert(math.abs(cv1 - lambda * v(1)) < 1e-6)
    assert(math.abs(v(0) * v(0) + v(1) * v(1) - 1.0) < 1e-9)
  }

  test("project: map-only dot product against the served component") {
    val comp = Array(0.6, 0.8)
    val got = Embeddings.project(tiny, "embedding", comp)
      .orderBy($"vec_id").select($"pc").as[Double].collect().toSeq
    assert(got.zip(Seq(2.2, 5.0, 10.2)).forall {
      case (a, b) => math.abs(a - b) < 1e-6 })
    // projection plan is exchange-free (a scan-side projection)
    val plan = Embeddings.project(tiny, "embedding", comp)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
  }

  test("standardize: hand-computed z-scores, zero-variance dim to 0") {
    // dim0: 1,3,5 -> mean 3, std 2; dim1 constant -> all zeros
    val df = Seq(Array(1f, 9f), Array(3f, 9f), Array(5f, 9f))
      .toDF("embedding")
    val got = Embeddings.standardize(df, "embedding")
      .select($"z").as[Seq[Double]].collect().toSeq.sortBy(_.head)
    assert(got === Seq(Seq(-1.0, 0.0), Seq(0.0, 0.0), Seq(1.0, 0.0)))
  }

  test("standardize on real embeddings: per-dim mean 0, std 1") {
    val emb = Tables.load(spark, sf, "embeddings")
    val z = Embeddings.standardize(emb, "embedding")
      .select(posexplode($"z").as(Seq("i", "z")))
    val stats = z.groupBy($"i")
      .agg(avg($"z").as("m"), stddev($"z").as("s"))
      .as[(Int, Double, Double)].collect()
    stats.foreach { case (i, m, s) =>
      assert(math.abs(m) < 1e-4, s"dim $i mean $m")
      assert(math.abs(s - 1.0) < 1e-4, s"dim $i std $s")
    }
  }

  test("knnGraph: k-bounded, no self loops, twin vectors at cos 1.0") {
    // distinct vectors only: a duplicate cluster in the raw data would
    // produce several cos-1.0 neighbors and outrank the twin
    val emb = Tables.load(spark, sf, "embeddings")
      .dropDuplicates("embedding").limit(300)
      .select($"vec_id", $"embedding")
    val doubled = emb.unionByName(
      emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val g = graft.llm.Similarity.knnGraph(doubled, "vec_id", "embedding", 3)
    assert(g.filter($"id_a" === $"id_b").count() === 0)
    val over = g.groupBy($"id_a").count().filter($"count" > 3).count()
    assert(over === 0, "more than k neighbors for some node")
    // every original vector's twin shares its bucket -> cos exactly 1.0
    // must appear as its top neighbor
    val twins = g.filter($"id_b" === $"id_a" + 100000 && $"cos" === 1.0)
    assert(twins.count() === emb.count())
  }

  test("sq8: codes bounded, recall >= 0.9, ample-shortlist rerank == brute force") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    // codes live in [-127, 127]
    val outOfRange = emb.select(explode(
        graft.llm.Similarity.sq8Quantize($"embedding")).as("q"))
      .filter($"q" > 127 || $"q" < -127).count()
    assert(outOfRange === 0)
    // quantized ranking is near-exact on unit-scale vectors
    val queries = emb.filter($"vec_id" < 20)
    val rec = graft.llm.Similarity.sq8Recall(emb, queries,
        "vec_id", "embedding", 10)
      .agg(min($"recall")).as[Double].head()
    assert(rec >= 0.9, s"sq8 min recall $rec")
    // with a shortlist far deeper than any quantization reorder, the
    // exact rerank reproduces the brute-force top-k EXACTLY
    val rer = graft.llm.Similarity.sq8TopKRerank(emb, queries,
        "vec_id", "embedding", 10, shortlist = 100)
      .select($"query_id", $"vec_id", $"cos", $"rank")
    val bf = graft.llm.Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", 10)
      .select($"query_id", $"vec_id", $"cos", $"rank")
    assert(rer.exceptAll(bf).isEmpty && bf.exceptAll(rer).isEmpty)
  }

  test("semanticDedup: cell-local drop equals global brute force on doubled corpus") {
    // identical copies always co-locate (same centroid distances,
    // deterministic tie-break) and no natural pair reaches 0.95, so the
    // cell-LOCAL SemDeDup drop set must equal the GLOBAL rule — the
    // same contract the dd_semantic oracle enforces
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val doubled = emb.unionByName(
      emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val got = graft.llm.Dedup.semanticDedup(doubled, "vec_id",
        "embedding", nlist = 8, threshold = 0.95)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    val globalDrop = doubled.alias("a").join(doubled.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(graft.llm.Dedup.cosine(
        col("a.embedding"), col("b.embedding")) >= 0.95)
      .select(col("b.vec_id")).as[Long].collect().toSet
    assert(got.size === doubled.count())
    for ((id, kept) <- got)
      assert(kept === !globalDrop.contains(id), s"vec $id")
    // every copy dropped, every original kept
    assert(got.filter(_._1 >= 100000).forall(!_._2))
    assert(got.filter(_._1 < 100000).forall(_._2))
  }

  test("semanticNovelty: copies non-novel, negated vectors novel, empty index all-novel") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val copies = emb.filter(pmod($"vec_id", lit(5)) === 0)
      .select(($"vec_id" + 200000).as("vec_id"), $"embedding")
    val fresh = emb.filter(pmod($"vec_id", lit(7)) === 0)
      .select(($"vec_id" + 300000).as("vec_id"),
        transform($"embedding", x => -x).as("embedding"))
    val got = graft.llm.Dedup.semanticNovelty(copies.unionByName(fresh),
        emb, "vec_id", "embedding", nlist = 8, threshold = 0.95)
      .as[(Long, Boolean)].collect().toMap
    assert(got.filter(_._1 < 300000).forall(!_._2), "a copy flagged novel")
    assert(got.filter(_._1 >= 300000).forall(_._2),
      "a negated vector flagged non-novel")
    // empty index: everything is novel, no training attempted
    val all = graft.llm.Dedup.semanticNovelty(copies, emb.limit(0),
      "vec_id", "embedding", nlist = 8, threshold = 0.95)
    assert(all.filter(!$"novel").count() === 0)
  }

  test("pca1 on real embeddings: top eigenvalue dominates trace share") {
    val emb = Tables.load(spark, sf, "embeddings")
    // near-isotropic real embeddings have a small top eigen-gap, so
    // convergence is slow ((lambda2/lambda1)^iters) — more driver-side
    // matvecs (64x64, trivial) and a gap-appropriate tolerance
    val (v, lambda) = Embeddings.pca1(emb, "embedding", iters = 500)
    val m = Embeddings.covarianceMatrix(emb, "embedding")
    val trace = m.indices.map(i => m(i)(i)).sum
    assert(lambda > 0 && lambda <= trace + 1e-9)
    // residual of the eigen contract, relative to lambda
    val cv = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val res = math.sqrt(cv.zip(v).map { case (a, b) =>
      val d = a - lambda * b; d * d }.sum)
    assert(res / lambda < 1e-2, s"eigen residual $res at lambda $lambda")
  }
}
