package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 — stage attribution for ivfTopKRp at large nlist: the sf1 arm
  * measured the composed top-k at 34.8 s where flat ivfTopK took
  * 17.5 s, even though the RP ASSIGNMENT alone wins 2.8 vs 8.7 s —
  * so the loss is in a non-assignment stage. Times each prefix of the
  * pipeline at nlist=3,200 on the sf0.1 doubled corpus. Run:
  * `sbt "Test/runMain graft.RpIvfStageProbe"` */
object RpIvfStageProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Similarity

    val e0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val corpus = e0.select(col("vec_id"), col("embedding")).unionByName(
        e0.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") < 5).localCheckpoint()
    val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding", 3200)
    println("[rpstage] trained")
    def time(mk: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once())
    }
    val dIn = 64; val dOut = Similarity.RpDim
    val pcents = {
      val m = Similarity.rpMatrix(dOut, dIn)
      cents.map(c => m.map(r =>
        r.zip(c).map { case (a, b) => a * b }.sum))
    }
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct(a, b)
    val c = corpus.select(col("vec_id").as("vec_id"),
        col("embedding").as("cv"))
      .withColumn("__graft_rp",
        Similarity.rpProject(col("cv"), dOut, dIn))
      .select(col("vec_id"),
        Similarity.nearestCell(col("__graft_rp"), pcents).as("cell"),
        col("__graft_rp").as("cp"))
      .withColumn("cn2", dot(col("cp"), col("cp")))
    println(f"[rpstage] corpus assign+proj       ${time(c)}%6.2f")
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .withColumn("__graft_rp",
        Similarity.rpProject(col("qv"), dOut, dIn))
      .select(col("query_id"),
        explode(Similarity.probeCells(col("__graft_rp"), pcents, 16))
          .as("cell"),
        col("__graft_rp").as("qp"))
      .withColumn("qn2", dot(col("qp"), col("qp")))
    println(f"[rpstage] query probe side         ${time(q)}%6.2f")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qn2") * col("cn2") > 0,
          round(dot(col("qp"), col("cp")) /
            sqrt(col("qn2") * col("cn2")), 6)).as("pcos"))
    println(f"[rpstage] + candidate scoring      ${time(scored)}%6.2f")
    // hypothesis splits: (a) materialize c first — if the join stage is
    // then cheap, the loss is re-evaluation/fusion of c's pipeline
    // inside the join stage; (b) drop the scoring projection — join
    // only; (c) scoring without the staged norms
    val cMat = c.localCheckpoint()
    val scoredMat = cMat.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("qn2") * col("cn2") > 0,
          round(dot(col("qp"), col("cp")) /
            sqrt(col("qn2") * col("cn2")), 6)).as("pcos"))
    println(f"[rpstage] scoring over mat'd c     ${time(scoredMat)}%6.2f")
    val joinOnly = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    println(f"[rpstage] join only (no scoring)   ${time(joinOnly)}%6.2f")
    val plan = scored.queryExecution.executedPlan.toString
    println("[rpstage] scored plan WholeStageCodegen spans: " +
      "\\(\\d+\\)".r.findAllIn(
        "WholeStageCodegen \\(\\d+\\)".r.findAllIn(plan).mkString(" "))
        .size + s"  fallback=${plan.contains("CodegenFallback")}")
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("vec_id"))
    val short = scored.withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= 200)
      .select(col("query_id"), col("vec_id"))
    println(f"[rpstage] + shortlist window       ${time(short)}%6.2f")
    println(f"[rpstage] full ivfTopKRp           ${time(
      Similarity.ivfTopKRp(corpus, queries, "vec_id", "embedding", 10,
        cents, 16, 200))}%6.2f")
    println(f"[rpstage] full ivfTopK (flat)      ${time(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
        cents, 16))}%6.2f")
    spark.stop()
  }
}
