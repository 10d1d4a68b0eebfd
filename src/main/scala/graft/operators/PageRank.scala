package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an explicit directed edge list — the classic
  * host/domain quality prior of web-corpus curation (Common Crawl
  * pipelines rank hosts by link authority and feed the score into
  * document filtering; cf. Page et al. 1999, "The PageRank citation
  * ranking").
  *
  * Iterative join-aggregate, the canonical Spark shape:
  *
  *   r'(v) = (1−d)/N + d · (Σ_{u→v} r(u)/outdeg(u) + dangling/N)
  *
  * Each iteration is ONE equi-join of the rank table against the edge
  * list on src plus one groupBy(dst) — both shuffles on graph keys,
  * nothing quadratic anywhere; partial aggregation combines in-sums
  * map-side. The rank frame is `localCheckpoint`ed every iteration:
  * without truncation the lineage doubles per round and Catalyst
  * re-optimization dominates past ~10 iterations (the connected-
  * components lesson, Dedup.scala). The dangling mass (rank parked on
  * sink nodes) is redistributed uniformly — one scalar aggregate per
  * iteration, the only driver-side state.
  *
  * A FIXED iteration count (no convergence epsilon) keeps the result
  * deterministic and replayable by an unrolled-SQL oracle. Output:
  * (id, rank rounded to 6) — ranks sum to ~1.
  */
object PageRank {

  def pageRank(nodes: DataFrame, id: String, edges: DataFrame,
               src: String = "src", dst: String = "dst",
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one node")
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"))
    val outdeg = e.groupBy(col("__src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    // base carries (id, outdeg|null): the join target every iteration
    val base = nodes.select(col(id).as("id"))
      .join(outdeg, Seq("id"), "left")
      .localCheckpoint()
    var ranks = base.select(col("id"), lit(1.0 / n).as("rank"),
      col("outdeg"))
    for (_ <- 1 to iters) {
      val dangling = ranks.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contrib = ranks.filter(col("outdeg").isNotNull)
        .select(col("id").as("__src"), (col("rank") / col("outdeg")).as("__c"))
        .join(e, Seq("__src"))
        .groupBy(col("__dst").as("id"))
        .agg(sum(col("__c")).as("in_sum"))
      ranks = base.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("in_sum"), lit(0.0)) + lit(dangling / n)))
            .as("rank"),
          col("outdeg"))
        .localCheckpoint()
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }
}
