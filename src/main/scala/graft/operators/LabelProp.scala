package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007, "Near linear
  * time algorithm to detect community structures") over an undirected
  * edge list — the community-detection sibling of connected components
  * (which is min-label propagation, `Dedup.connectedComponents`): a
  * node adopts the MOST FREQUENT label among its neighbors instead of
  * the smallest, so dense clusters keep distinct labels instead of all
  * collapsing toward the global minimum through bridge edges. The
  * corpus-curation use: partition the kNN/similarity graph
  * ([[graft.llm.Similarity.knnGraph]]) into topical communities for
  * mixture balancing, dedup review, or stratified eval splits.
  *
  * Iteration shape (the PageRank lesson, `PageRank.scala`): ONE
  * labels⋈edges equi-join on the neighbor key + one
  * groupBy(node, label) count + one argmax per node — all shuffles on
  * graph keys, partial aggregation combines counts map-side, nothing
  * quadratic. The argmax avoids a window entirely:
  * `max(struct(cnt, -label))` picks highest count with smallest-label
  * tie-break in the SAME hash aggregate. The label frame is
  * `localCheckpoint`ed per round to truncate lineage.
  *
  * Deterministic by construction — synchronous updates (no
  * visit-order dependence) + total-order tie-break + a FIXED iteration
  * count, so an unrolled-SQL oracle replays it exactly. The classic
  * caveat inherited from synchronous LPA: bipartite-ish regions can
  * oscillate between two labelings rather than converge; a fixed even
  * iteration count still yields a deterministic (and for community
  * structure, useful) state. Isolated nodes keep their own id as
  * label. Output: (id, label). */
object LabelProp {

  /** @param edges undirected edge list; each (a,b) row is one edge,
    *              oriented both ways internally. Self-loops and
    *              duplicate edges are honored as given (a duplicate
    *              edge doubles that neighbor's vote). */
  def labelProp(nodes: DataFrame, id: String, edges: DataFrame,
                a: String = "id_a", b: String = "id_b",
                iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(a).as("__a"), col(b).as("__b"))
    val eBoth = e.unionByName(
        e.select(col("__b").as("__a"), col("__a").as("__b")))
      .localCheckpoint()
    var labels = nodes.select(col(id).as("id"), col(id).cast("long").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val votes = labels.select(col("id").as("__b"), col("label"))
        .join(eBoth, Seq("__b"))
        .groupBy(col("__a").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val best = votes.groupBy(col("id"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("newlab"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("newlab"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
