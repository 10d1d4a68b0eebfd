package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense linear algebra over embedding columns: moment sums, sample
  * covariance, and power-iteration PCA. The distributed piece is ONLY
  * moment accumulation; everything eigen happens on the d×d matrix —
  * model-sized driver state (d = 64 → 32 KiB), the same
  * train-on-driver / serve-as-literals shape as the IVF/PQ models.
  */
object Embeddings {

  /** Pairwise second-moment sums of a d-dim vector column, one
    * distributed pass: (i, j, n, sx, sy, sxy) for i ≤ j. The double
    * posexplode makes the outer product relational; partial aggregation
    * (map-side combine) collapses every task's contribution to
    * ≤ d(d+1)/2 rows before the single exchange — the shuffle carries
    * the MODEL (d² rows total), never the data, so the plan is
    * unchanged at 100 TB (the d² per-row multiply work is the outer
    * product's intrinsic cost, pipelined inside codegen, nothing
    * materialized). Floats are widened to double BEFORE multiplying so
    * the oracle's double arithmetic agrees term-for-term. */
  def momentSums(df: DataFrame, vec: String): DataFrame =
    df.select(posexplode(col(vec)).as(Seq("i", "xi")), col(vec).as("__v"))
      .select(col("i"), col("xi").cast(DoubleType).as("xi"),
        posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"), col("xi"),
        col("xj").cast(DoubleType).as("xj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"),
        sum(col("xj")).as("sy"), sum(col("xi") * col("xj")).as("sxy"))

  /** Sample covariance matrix, upper triangle: (i, j, cov) for i ≤ j,
    * cov = (Σxy − ΣxΣy/n)/(n−1) — the covar_samp identity, written as
    * explicit moment sums so an oracle reproduces it to the ulp-class.
    * Rounded to 6 places for engine-portable comparison; the `+ 0.0`
    * folds IEEE −0.0 to +0.0 (engines disagree on the SIGN of a zero
    * that rounding produced, and text-level comparators see "−0.0"). */
  def covariance(df: DataFrame, vec: String): DataFrame =
    momentSums(df, vec)
      .select(col("i"), col("j"),
        (round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("n") - lit(1L)), 6) + lit(0.0)).as("cov"))

  /** Dense symmetric covariance matrix on the driver (d×d doubles —
    * model-sized), reconstructed from the upper-triangle moment sums. */
  def covarianceMatrix(df: DataFrame, vec: String): Array[Array[Double]] = {
    val rows = momentSums(df, vec)
      .select(col("i"), col("j"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("n") - lit(1L))).as("cov"))
      .collect()
    val d = rows.iterator.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Top principal component by power iteration on the driver-side
    * covariance (deterministic start vector, normalized each step).
    * Returns (eigenvector, eigenvalue). Deflate-and-repeat for more
    * components; the distributed cost is the ONE momentSums pass. */
  def pca1(df: DataFrame, vec: String, iters: Int = 100): (Array[Double], Double) = {
    val m = covarianceMatrix(df, vec)
    val d = m.length
    var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }; s
      })
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "power iteration collapsed: zero-variance input")
      v = w.map(_ / norm)
      lambda = norm
      it += 1
    }
    (v, lambda)
  }

  /** Map-only projection of the vector column onto a fixed component —
    * serving the PCA model as a literal, scoring 100 TB is a scan. */
  def project(df: DataFrame, vec: String, comp: Array[Double]): DataFrame =
    df.withColumn("pc",
      graft.functions.DotProduct(col(vec), typedLit(comp.toSeq)))

  /** Per-dimension z-score standardization of the vector column. The
    * model (d means + d stds) trains in ONE diagonal-moment pass —
    * explode is map-only and partial aggregation collapses each task
    * to d rows before the exchange; only 2d doubles reach the driver —
    * then serves as array literals in a map-only transform (the
    * train-once/score-as-a-scan shape shared with IVF/PQ/BM25).
    * Zero-variance dimensions standardize to 0 by convention. Appends
    * `z`: array<double>, each entry rounded to 6 with −0.0 folded. */
  def standardize(df: DataFrame, vec: String): DataFrame = {
    val stats = df.select(posexplode(col(vec)).as(Seq("i", "x")))
      .select(col("i"), col("x").cast(DoubleType).as("x"))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("i"), (col("sx") / col("n")).as("mean"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
          (col("n") - lit(1L))).as("std"))
      .collect().sortBy(_.getInt(0))
    val mLit = typedLit(stats.map(_.getDouble(1)).toSeq)
    val sLit = typedLit(stats.map(_.getDouble(2)).toSeq)
    df.withColumn("z", transform(col(vec), (x, i) => {
      val m = element_at(mLit, i + 1)
      val s = element_at(sLit, i + 1)
      when(s > 0.0,
        round((x.cast(DoubleType) - m) / s, 6) + lit(0.0))
        .otherwise(0.0)
    }))
  }
}
