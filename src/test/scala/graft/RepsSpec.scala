package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** expandCliques=false (clique-representative output) — the 100 TB
  * product shape for the pair-quadratic similarity joins (r9 verdict
  * #2). Contract pinned here for every family and BOTH plan arms:
  * expanding each representative row by its clique membership
  * reconstructs the default (expanded) output EXACTLY — pair set and
  * metric values — while the reps output itself stays one row per
  * qualifying clique pair plus one self row per multi-member clique
  * (self forms only).
  *
  * Membership ground truth is recomputed in the test from the planted
  * corpus (token set / token multiset / exact string equivalence —
  * whichever the operator's collapse key is). */
class RepsSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: duplicate cliques of sizes 3, 2, 2 plus near-dups
  // and a singleton; multiset duplicates (repeated tokens) for the
  // weighted family
  private val corpus = Seq(
    0L -> "alpha beta gamma",
    1L -> "alpha beta gamma",
    2L -> "alpha beta gamma",
    3L -> "alpha beta gamma delta",
    4L -> "alpha beta gamma delta",
    5L -> "alpha beta",
    6L -> "zeta eta theta",
    7L -> "zeta eta theta",
    8L -> "zeta eta",
    9L -> "unique tokens here",
    10L -> "alpha alpha beta",
    11L -> "alpha alpha beta")
  private lazy val df = corpus.toDF("doc_id", "text")

  private def toksOf(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** members per representative under an equivalence key. */
  private def membersBy[K](key: String => K): Map[Long, Seq[Long]] =
    corpus.groupBy(c => key(c._2)).values
      .map(g => g.map(_._1).min -> g.map(_._1).sorted).toMap

  private val setMembers = membersBy(t => toksOf(t).toSet)
  private val bagMembers = membersBy(t => toksOf(t).sorted)

  /** Expand reps rows (id_a, id_b, n_a, n_b) to member pairs; self rows
    * (id_a == id_b) expand to intra pairs. `ordered` = pair direction
    * matters (containment); unordered forms emit doc_a < doc_b. */
  private def expand(reps: Seq[(Long, Long, Long, Long)],
                     members: Map[Long, Seq[Long]],
                     ordered: Boolean): Set[(Long, Long)] =
    reps.flatMap { case (ra, rb, na, nb) =>
      if (ra == rb) {
        val ms = members(ra)
        assert(na == ms.size && nb == ms.size, s"clique size at $ra")
        for (a <- ms; b <- ms; if a != b; if ordered || a < b)
          yield (a, b)
      } else {
        val (msA, msB) = (members(ra), members(rb))
        assert(na == msA.size && nb == msB.size, s"sizes at ($ra,$rb)")
        for (a <- msA; b <- msB)
          yield if (ordered) (a, b) else (math.min(a, b), math.max(a, b))
      }
    }.toSet

  /** metric values must agree between a reps row and the expanded rows
    * of its clique pair (any member pair carries the clique's value). */
  private def checkValues(repsRows: Seq[(Long, Long, Double)],
                          expRows: Map[(Long, Long), Double],
                          members: Map[Long, Seq[Long]],
                          ordered: Boolean): Unit =
    repsRows.foreach { case (ra, rb, v) =>
      if (ra != rb) {
        val a = members(ra).head
        val b = members(rb).head
        val k = if (ordered) (a, b)
          else (math.min(a, b), math.max(a, b))
        assert(expRows(k) == v, s"value mismatch at ($ra,$rb)")
      } else assert(v == 1.0, s"self row at $ra not 1.0")
    }

  private def runBoth(op: Long => DataFrame)
      : Seq[DataFrame] =
    // vocabMax 0 forces the prefix arm; a large ceiling lets the dense
    // arm dispatch (the planted vocab is tiny) — both must agree
    Seq(0L, 4096L).map(op)

  test("allPairs reps ≡ expanded, both arms") {
    runBoth { vm =>
      Dedup.allPairs(df, "doc_id", "text", 0.5, denseVocabMax = vm,
        expandCliques = false)
    }.foreach { reps =>
      val exp = Dedup.allPairs(df, "doc_id", "text", 0.5)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect()
      val r = reps.select($"doc_a", $"doc_b", $"jaccard", $"n_a", $"n_b")
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
      // reps ids are clique representatives; no duplicate rows
      assert(r.map(x => (x._1, x._2)).distinct.size == r.size)
      assert(expand(r.map(x => (x._1, x._2, x._4, x._5)), setMembers,
        ordered = false) === exp.map(x => (x._1, x._2)).toSet)
      checkValues(r.map(x => (x._1, x._2, x._3)),
        exp.map(x => (x._1, x._2) -> x._3).toMap, setMembers,
        ordered = false)
    }
  }

  test("containmentJoin reps ≡ expanded, both arms") {
    runBoth { vm =>
      Dedup.containmentJoin(df, "doc_id", "text", 0.6, denseVocabMax = vm,
        expandCliques = false)
    }.foreach { reps =>
      val exp = Dedup.containmentJoin(df, "doc_id", "text", 0.6)
        .select($"id_a", $"id_b", $"containment")
        .as[(Long, Long, Double)].collect()
      val r = reps.select($"id_a", $"id_b", $"containment", $"n_a", $"n_b")
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
      assert(r.map(x => (x._1, x._2)).distinct.size == r.size)
      assert(expand(r.map(x => (x._1, x._2, x._4, x._5)), setMembers,
        ordered = true) === exp.map(x => (x._1, x._2)).toSet)
      checkValues(r.map(x => (x._1, x._2, x._3)),
        exp.map(x => (x._1, x._2) -> x._3).toMap, setMembers,
        ordered = true)
    }
  }

  test("tfidfPairs reps ≡ expanded, both arms") {
    runBoth { vm =>
      Dedup.tfidfPairs(df, "doc_id", "text", 0.5, denseVocabMax = vm,
        expandCliques = false)
    }.foreach { reps =>
      val exp = Dedup.tfidfPairs(df, "doc_id", "text", 0.5)
        .select($"doc_a", $"doc_b", $"cos")
        .as[(Long, Long, Double)].collect()
      val r = reps.select($"doc_a", $"doc_b", $"cos", $"n_a", $"n_b")
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
      assert(r.map(x => (x._1, x._2)).distinct.size == r.size)
      assert(expand(r.map(x => (x._1, x._2, x._4, x._5)), bagMembers,
        ordered = false) === exp.map(x => (x._1, x._2)).toSet)
      checkValues(r.map(x => (x._1, x._2, x._3)),
        exp.map(x => (x._1, x._2) -> x._3).toMap, bagMembers,
        ordered = false)
    }
  }

  test("cross-corpus reps ≡ expanded: allPairsJoin / containmentCross / tfidfJoin") {
    // right side: copies of some left docs under shifted ids plus a
    // near-dup — cross-side identical sets must meet at metric 1
    val right = Seq(100L -> "alpha beta gamma", 101L -> "alpha beta gamma",
      102L -> "zeta eta theta", 103L -> "alpha beta gamma delta epsilon")
      .toDF("doc_id", "text")
    val rightMembers = Map(100L -> Seq(100L, 101L), 102L -> Seq(102L),
      103L -> Seq(103L))
    def checkCross(expDf: DataFrame, repsDf: DataFrame,
                   valCol: String): Unit = {
      val exp = expDf.select(col("id_a"), col("id_b"), col(valCol))
        .as[(Long, Long, Double)].collect()
      val r = repsDf.select(col("id_a"), col("id_b"), col(valCol),
          col("n_a"), col("n_b"))
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
      assert(r.map(x => (x._1, x._2)).distinct.size == r.size)
      val got = r.flatMap { case (ra, rb, _, na, nb) =>
        val (msA, msB) = (setMembers(ra), rightMembers(rb))
        assert(na == msA.size && nb == msB.size)
        for (a <- msA; b <- msB) yield (a, b)
      }.toSet
      assert(got === exp.map(x => (x._1, x._2)).toSet)
      val expVals = exp.map(x => (x._1, x._2) -> x._3).toMap
      r.foreach { case (ra, rb, v, _, _) =>
        assert(expVals((setMembers(ra).head, rightMembers(rb).head)) == v)
      }
    }
    for (vm <- Seq(0L, 4096L)) {
      checkCross(
        Dedup.allPairsJoin(df, right, "doc_id", "text", 0.5),
        Dedup.allPairsJoin(df, right, "doc_id", "text", 0.5,
          denseVocabMax = vm, expandCliques = false), "jaccard")
      checkCross(
        Dedup.containmentCross(df, right, "doc_id", "text", 0.6),
        Dedup.containmentCross(df, right, "doc_id", "text", 0.6,
          denseVocabMax = vm, expandCliques = false), "containment")
    }
    // tfidf uses multiset equivalence — the planted right side has no
    // repeated-token docs, so set- and bag-members coincide there;
    // LEFT side still exercises the bag collapse (docs 10, 11)
    for (vm <- Seq(0L, 4096L)) {
      val exp = Dedup.tfidfJoin(df, right, "doc_id", "text", 0.5)
        .select($"id_a", $"id_b", $"cos")
        .as[(Long, Long, Double)].collect()
      val r = Dedup.tfidfJoin(df, right, "doc_id", "text", 0.5,
          denseVocabMax = vm, expandCliques = false)
        .select($"id_a", $"id_b", $"cos", $"n_a", $"n_b")
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
      val got = r.flatMap { case (ra, rb, _, na, nb) =>
        val (msA, msB) = (bagMembers(ra), rightMembers(rb))
        assert(na == msA.size && nb == msB.size)
        for (a <- msA; b <- msB) yield (a, b)
      }.toSet
      assert(got === exp.map(x => (x._1, x._2)).toSet)
    }
  }

  test("jaroWinklerJoin reps ≡ expanded (self and cross)") {
    val names = Seq(0L -> "jonathan", 1L -> "jonathan", 2L -> "jonathan",
      3L -> "jonathon", 4L -> "marta", 5L -> "martha", 6L -> "martha",
      7L -> "", 8L -> "")
    val nd = names.toDF("id", "nm")
    val nameMembers = names.groupBy(_._2).values
      .map(g => g.map(_._1).min -> g.map(_._1).sorted).toMap
    val t = 0.9
    val exp = graft.operators.JaroWinklerJoin.selfJoin(nd, "id", "nm", t)
      .select($"id_a", $"id_b", $"jw").as[(Long, Long, Double)].collect()
    val r = graft.operators.JaroWinklerJoin
      .selfJoin(nd, "id", "nm", t, expandCliques = false)
      .select($"id_a", $"id_b", $"jw", $"n_a", $"n_b")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(r.map(x => (x._1, x._2)).distinct.size == r.size)
    // empty-name clique (ids 7, 8) must appear in NEITHER form
    assert(!r.exists(x => x._1 == 7L || x._1 == 8L))
    assert(expand(r.map(x => (x._1, x._2, x._4, x._5)), nameMembers,
      ordered = false) === exp.map(x => (x._1, x._2)).toSet)
    checkValues(r.map(x => (x._1, x._2, x._3)),
      exp.map(x => (x._1, x._2) -> x._3).toMap, nameMembers,
      ordered = false)
    // cross form
    val rightN = Seq(100L -> "jonathan", 101L -> "jonathan",
      102L -> "martha").toDF("id", "nm")
    val rightMembers = Map(100L -> Seq(100L, 101L), 102L -> Seq(102L))
    val expC = graft.operators.JaroWinklerJoin
      .crossJoin(nd, rightN, "id", "nm", t)
      .select($"id_a", $"id_b", $"jw").as[(Long, Long, Double)].collect()
    val rC = graft.operators.JaroWinklerJoin
      .crossJoin(nd, rightN, "id", "nm", t, expandCliques = false)
      .select($"id_a", $"id_b", $"jw", $"n_a", $"n_b")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    val gotC = rC.flatMap { case (ra, rb, _, na, nb) =>
      val (msA, msB) = (nameMembers(ra), rightMembers(rb))
      assert(na == msA.size && nb == msB.size)
      for (a <- msA; b <- msB) yield (a, b)
    }.toSet
    assert(gotC === expC.map(x => (x._1, x._2)).toSet)
  }
}
