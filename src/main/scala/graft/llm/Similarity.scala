package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, rank per query. The baseline and the
  *    verifier for the approximate paths. O(|queries|·|corpus|) but
  *    map-side only (no corpus shuffle) when queries broadcast.
  *  - [[lshTopK]] — random-hyperplane LSH with multi-probe: deterministic
  *    pseudo-random planes embedded as LITERAL weight arrays (computed
  *    once driver-side — never per row), sign-bit bucket code per vector,
  *    query probes every bucket within `probeRadius` bit flips, exact
  *    cosine re-rank on the candidates. 16 planes = 65,536 buckets: at
  *    100 TB each bucket holds ~1.5 GB, and the probe join is an
  *    equi-join on the bucket code, so a probe touches
  *    |probes|/65,536 of the corpus instead of all of it.
  *  - [[ivfTopK]] — IVF-style coarse quantization: corpus assigned to
  *    `nlist` cells; a query probes its own cell plus the cells reached
  *    by single-plane flips (`nprobe` total). With the corpus written
  *    `partitionBy("cell")`, the probe is a partition-pruned scan.
  */
object Similarity {

  /** Exact cosine top-k. `queries` should be small (it is broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  val Planes = 16
  val Dim = 64

  /** Deterministic hyperplane matrix: planes(p)(d) =
    * ((rollLocal("p:d") % 2001) - 1000) / 1000.0 ∈ [-1, 1]. Computed ONCE
    * here (via the single shared replica of the rolling-hash recurrence,
    * TextAnalysis.rollLocal) and embedded as literals — any engine
    * reproduces it from the formula, and no per-row recompute happens on
    * the executors. */
  def planeMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      ((TextAnalysis.rollLocal(s"$p:$d") % 2001) - 1000).toDouble / 1000.0
    }

  /** Sign-LSH bucket code of a vector: bit p = 1 iff dot(v, plane_p) > 0.
    *
    * Each plane's dot is one codegen'd [[graft.functions.DotProduct]]
    * node over a literal weight array — a small, flat expression tree.
    * (The original 16 zip_with+aggregate lambda subtrees put thousands
    * of nodes in the plan and Catalyst's optimizer passes, not the
    * data, dominated the runtime.) */
  def bucketCode(vec: Column, planes: Int = Planes, dim: Int = Dim): Column = {
    val m = planeMatrix(planes, dim)
    (0 until planes).map { p =>
      when(graft.functions.DotProduct(vec, typedLit(m(p).toSeq)) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** All bucket codes within `radius` bit flips of `bucket` (multi-probe
    * LSH, radius ≤ 2): the query-side probe list. |probes| =
    * 1 + planes + planes·(planes-1)/2 at radius 2 (137 for 16 planes).
    * One transform over a literal mask array — constant tree size. */
  def probeBuckets(bucket: Column, planes: Int = Planes,
                   radius: Int = 2): Column = {
    require(radius >= 0 && radius <= 2, "probe radius supports 0..2")
    val masks: Seq[Long] =
      Seq(0L) ++
        (if (radius >= 1) (0 until planes).map(i => 1L << i) else Nil) ++
        (if (radius >= 2)
           for { i <- 0 until planes; j <- i + 1 until planes }
             yield (1L << i) | (1L << j)
         else Nil)
    transform(typedLit(masks), m => bucket.bitwiseXOR(m))
  }

  /** Multi-probe LSH approximate top-k: the query explodes its probe
    * list; candidates are an equi-join on the bucket code (each corpus
    * row has exactly one bucket, so no candidate dedup is needed);
    * exact cosine re-rank on the candidates. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, planes: Int = Planes,
              probeRadius: Int = 2): DataFrame = {
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
      .withColumn("bucket", bucketCode(col("cv"), planes))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("bucket",
        explode(probeBuckets(bucketCode(col("qv"), planes), planes, probeRadius)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF cell assignment: `nlist` coarse cells by bucket code modulo
    * nlist (a deterministic stand-in for trained centroids). Write the
    * result `partitionBy("cell")` and a probe becomes a partition-pruned
    * scan of |probed cells|/nlist of the data. */
  def ivfAssign(corpus: DataFrame, id: String, vec: String,
                nlist: Int): DataFrame =
    corpus.select(col(id), col(vec),
      pmod(bucketCode(col(vec)), lit(nlist)).as("cell"))

  /** IVF search path: queries probe their own cell plus the cells reached
    * by each single-plane flip of the sign code (deduplicated after the
    * modulo), exact cosine re-rank inside the probed cells. The
    * corpus-side work is an equi-join on `cell` — with a cell-partitioned
    * corpus layout this reads only the probed partitions. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, nlist: Int = 32): DataFrame = {
    val c = ivfAssign(corpus, id, vec, nlist)
      .select(col(id).as("vec_id"), col(vec).as("cv"), col("cell"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("cell",
        explode(array_distinct(transform(
          probeBuckets(bucketCode(col("qv")), Planes, 1),
          b => pmod(b, lit(nlist))))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
