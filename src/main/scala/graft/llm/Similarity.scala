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
  *  - [[lshTopK]] — random-hyperplane LSH: deterministic pseudo-random
  *    planes (polynomial-hash-seeded, engine-portable), sign-bit bucket
  *    code per vector, candidates = same-bucket rows (optionally within
  *    hamming radius via multi-probe on the query side), exact cosine
  *    re-rank inside buckets. At 100 TB the bucket join shuffles on the
  *    8-bit code — each probe touches ~1/256 of the corpus instead of
  *    all of it.
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

  val Planes = 8

  /** Deterministic hyperplane component for (plane p, dim d) in [-1, 1]:
    * derived from the polynomial hash of "p:d" — identical in any engine,
    * no RNG state. */
  private def planeComponent(p: Int, d: Column): Column = {
    val h = TextAnalysis.tokenHash(concat(lit(s"$p:"), d.cast(StringType)))
    (h % 2001 - 1000).cast(DoubleType) / 1000.0
  }

  /** 8-bit sign-LSH bucket code of a vector: bit p = 1 iff
    * dot(v, plane_p) > 0. */
  def bucketCode(vec: Column): Column =
    (0 until Planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: candidates share the query's bucket
    * code; exact cosine re-rank within the bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
      .withColumn("bucket", bucketCode(col("cv")))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("bucket", bucketCode(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style variant: corpus pre-partitioned into `nlist` coarse cells
    * by bucket code modulo nlist (a stand-in for trained centroids that
    * keeps determinism); queries probe their own cell. Demonstrates the
    * partition-pruned scan shape: with the corpus written
    * partitionBy("cell"), a probe reads 1/nlist of the data. */
  def ivfAssign(corpus: DataFrame, id: String, vec: String,
                nlist: Int): DataFrame =
    corpus.select(col(id), col(vec),
      pmod(bucketCode(col(vec)), lit(nlist)).as("cell"))
}
