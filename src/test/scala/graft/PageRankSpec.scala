package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank: closed-form cycle, dangling redistribution vs a
  * driver-side reference loop, mass conservation. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("3-cycle is uniform at any damping: each rank 1/3") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.pageRank(nodes, "id", edges)
      .orderBy($"id").select($"rank").as[Double].collect().toSeq
    assert(got === Seq(0.333333, 0.333333, 0.333333))
  }

  test("dangling mass redistributes: matches a scalar reference loop") {
    // A -> B, B and C dangling
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.pageRank(nodes, "id", edges, iters = 10)
      .orderBy($"id").select($"rank").as[Double].collect().toSeq
    // reference mirrors the engine's float grouping exactly:
    // r'(v) = (1-d)/N + d*(in_sum + dang/N)
    var r = Array(1.0 / 3, 1.0 / 3, 1.0 / 3)
    val tele = (1.0 - 0.85) / 3
    for (_ <- 1 to 10) {
      val dangOverN = (r(1) + r(2)) / 3
      r = Array(
        tele + 0.85 * (0.0 + dangOverN),
        tele + 0.85 * (r(0) + dangOverN),
        tele + 0.85 * (0.0 + dangOverN))
    }
    val exp = r.map(x => BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got === exp.toSeq)
  }

  test("labelProp: two triangles joined by a bridge settle into two communities") {
    // hand-computed 4-round synchronous trace: the bridge 3-7 pulls
    // labels across briefly, but by round 4 each triangle holds its
    // own min id — where min-label CC would merge everything into {1}
    val nodes = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L), (3L, 7L)).toDF("id_a", "id_b")
    val got = graft.operators.LabelProp.labelProp(nodes, "id", edges, iters = 4)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (7L, 3L), (8L, 3L), (9L, 3L)))
    val cc = graft.llm.Dedup.connectedComponents(nodes, "id", edges)
    assert(cc.select(countDistinct($"rep")).as[Long].head() === 1L,
      "CC merges across the bridge — LPA must be strictly finer here")
  }

  test("labelProp: isolated node keeps its own id; duplicate edge outweighs") {
    val nodes = Seq(1L, 2L, 3L, 99L).toDF("id")
    // node 1 sees label 3 twice (duplicate edge) and label 2 once
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val got = graft.operators.LabelProp.labelProp(nodes, "id", edges, iters = 1)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(got.find(_._1 == 99L).get._2 === 99L)
    assert(got.find(_._1 == 1L).get._2 === 3L,
      "doubled vote must beat the smaller single-vote label")
  }

  test("rank mass is conserved (~1) and varies on a non-regular graph") {
    val docs = Tables.load(spark, sf, "documents")
    val nodes = docs.select(pmod($"doc_id", lit(50)).as("id")).distinct()
    val ev = docs.filter(pmod($"doc_id", lit(2)) === 0)
    val edges = ev.select(pmod($"doc_id", lit(50)).as("src"),
        pmod($"doc_id" * $"doc_id" + 7, lit(50)).as("dst"))
      .unionByName(ev.select(pmod($"doc_id", lit(50)).as("src"),
        pmod($"doc_id" * 17 + 3, lit(50)).as("dst")))
      .distinct()
    val ranks = PageRank.pageRank(nodes, "id", edges, iters = 10)
    val (total, mn, mx) = ranks
      .agg(sum($"rank"), min($"rank"), max($"rank"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(total - 1.0) < 1e-3, s"mass drifted: $total")
    assert(mx > mn, "a hash-derived irregular graph must not be uniform")
  }

  // ---- Triangles ---------------------------------------------------

  test("triangles: K4, star, path, and edge-canonicalization by hand") {
    // K4 (4 triangles, each node in 3) + a star center 10 (0 triangles)
    // + a dangling path 20-21; duplicate and reversed edges collapse,
    // self-loops drop
    val edges = (for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)) ++ // K4 given BOTH directions — must dedup
      Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L), (5L, 5L))
    val got = graft.operators.Triangles
      .perNode(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 0L, 20L -> 0L, 21L -> 0L)
    assert(got == want) // node 5 only had a self-loop → not in output
  }

  test("triangles: random-graph parity with a driver brute force") {
    val r = new scala.util.Random(17)
    val edges = (0 until 400)
      .map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
    val got = graft.operators.Triangles
      .perNode(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.toSeq.sorted.combinations(3)
      if es((x, y)) && es((x, z)) && es((y, z))
      n <- Seq(x, y, z)
    } triCount(n) += 1
    val want = nodes.map(n => n -> triCount(n)).toMap
    assert(got == want)
    assert(got.values.sum > 0, "random graph should contain triangles")
  }
}
