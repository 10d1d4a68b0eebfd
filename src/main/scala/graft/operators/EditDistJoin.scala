package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via DELETION-NEIGHBORHOOD
  * blocking (the FastSS / SymSpell scheme, Bocek et al. 2007): two
  * strings are within Levenshtein distance 1 iff their deletion
  * neighborhoods (the string itself plus every single-character
  * deletion) intersect — substitution at i ⇒ both sides share the
  * i-deleted string; insertion/deletion ⇒ the longer side's deletion
  * neighborhood contains the shorter string. So the join is an
  * EQUI-join on the variant key, never an all-pairs scan: variants =
  * n·(len+1) rows, candidates = true near-pairs plus identical-variant
  * collisions, verified by one exact `levenshtein` (codegen'd) after a
  * pair-dedup. The entity-resolution primitive for short strings
  * (names, titles, codes); for d ≥ 2 the same scheme generalizes to
  * multi-deletion neighborhoods at (len choose d) variants per row —
  * keep d = 1 and normalize first (lower/trim) in practice.
  *
  * Callers should deduplicate identical strings first (one id per
  * distinct string): k copies of the same string form a k² clique of
  * distance-0 pairs — the dd_simhash distinct-signature lesson.
  *
  * Output: (id_a, id_b, dist) with id_a < id_b, one row per pair. */
object EditDistJoin {

  def selfJoin(df: DataFrame, id: String, text: String): DataFrame = {
    val base = df.select(col(id).as("__id"), col(text).as("__nm"))
    // the string plus each single-deletion; length-0 strings have only
    // themselves (sequence(1,0) would run DESCENDING in Spark — guard)
    val vars = base.select(col("__id"), col("__nm"),
      explode(expr(
        """CASE WHEN length(__nm) = 0 THEN array(__nm)
          |ELSE array_union(array(__nm),
          |  transform(sequence(1, length(__nm)),
          |    i -> concat(substring(__nm, 1, i - 1),
          |                substring(__nm, i + 1, length(__nm)))))
          |END""".stripMargin)).as("__v"))
    val a = vars.select(col("__id").as("id_a"), col("__nm").as("nm_a"),
      col("__v"))
    val b = vars.select(col("__id").as("id_b"), col("__nm").as("nm_b"),
      col("__v"))
    a.join(b, Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(levenshtein(col("nm_a"), col("nm_b")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).as("dist"))
  }
}
