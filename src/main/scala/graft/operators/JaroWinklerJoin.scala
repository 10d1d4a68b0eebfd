package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT Jaro-Winkler similarity joins — entity-resolution for
  * names/titles/codes where [[EditDistJoin]]'s distance-1 bar is too
  * strict and a Jaccard token bar is too loose. Every qualifying pair
  * has jw ≥ `threshold` under the [[graft.functions.JaroWinkler]]
  * definition (= DuckDB's), with NO recall loss: the blocking below is
  * derived from provable bounds, so the candidate set provably
  * contains every qualifying pair, and membership is decided by the
  * exact jw compare.
  *
  * The pipeline is the repo's signature-collapse + prefix-filter
  * pattern, instantiated for an EDIT-style measure:
  *
  *   1. Collapse to DISTINCT strings (duplicate names are k² cliques
  *      of jw = 1 pairs — compute once, expand at the end).
  *   2. Bound chain, all integer-ppm exact: jw ≥ t with Winkler boost
  *      ℓ ≤ 4, p = 0.1 forces jaro ≥ j := (t−0.4)/0.6 (hence the
  *      t > 0.7 require — below that the Winkler region bound is
  *      void). jaro ≥ j forces, for lengths l₁ ≤ l₂,
  *        - length band: l₁/l₂ ≥ 3j−2 (from m ≤ l₁ and the jaro sum),
  *        - match floor: m ≥ ⌈l₁·(3j−1)/2⌉ (from m/l₁+m/l₂ ≥ 3j−1).
  *      Matched characters are ≤ the (char, occurrence) SET overlap —
  *      the multiset-as-set encoding — so qualifying pairs share at
  *      least that many (char, occ) tokens.
  *   3. AllPairs prefix filter on those tokens under the global
  *      rarest-first order: a doc of length l keys the join only on
  *      its first l − o + 1 tokens, where o is the match floor at the
  *      SMALLEST partner length the band allows — the globally-first
  *      shared token of a qualifying pair provably lands in both
  *      prefixes, and the pair is emitted exactly there (head of
  *      `array_intersect`, the [[graft.llm.Dedup.allPairs]] dedup).
  *   4. Verify: one codegen'd jw per candidate, ≥ t exact.
  *   5. Expand distinct-string pairs back to id pairs; same-string
  *      cliques emit jw = 1 directly (jw = 1 ⟺ equality).
  *
  * [[crossJoin]] is the two-sided form (link a new crawl's entities
  * against a master list): the char-frequency order — and hence every
  * prefix the lemma reasons about — is computed over the UNION of
  * both sides' distinct names (one shared total order, the
  * [[graft.llm.Dedup.allPairsJoin]] requirement); identical strings
  * across sides flow through the regular candidate path and verify at
  * exactly 1.0.
  *
  * Shuffles: the distinct-collapse groupBys, the char-level rank
  * windows (partitioned by string), the prefix equi-join, and the
  * expansion joins — all key-partitioned, nothing all-pairs, no
  * broadcast assumptions. Skewed blocks (a common rare-char bucket)
  * behave like any hot equi-join key: AQE skew splitting applies. */
object JaroWinklerJoin {

  private final case class Bounds(t: Double, a3: Long, b3: Long)

  private def boundsOf(threshold: Double): Bounds = {
    require(threshold > 0.7 && threshold <= 1.0,
      s"threshold must be in (0.7, 1]: $threshold")
    val tPpm = math.round(threshold * 1000000)
    require(math.abs(tPpm / 1e6 - threshold) < 1e-12,
      s"threshold must have at most 6 decimal places: $threshold")
    // jaro floor in ppm, rounded DOWN: (t − 0.4)·10⁶ / 0.6 truncated.
    // Rounding up (ceil) made the length-band and match-floor pruning
    // ~1 ppm stricter than the provable bound and dropped pairs whose
    // jw equals the threshold exactly (e.g. t = 0.935, |a| = 27,
    // |b| = 40, m = 27, 0 transpositions, 4-char prefix → jw = 0.935:
    // the ceil'd band required 27e6 ≥ 675001·40 and pruned it). Floor
    // keeps every downstream bound valid but conservative — candidates
    // a hair below threshold survive to the exact verify, which is the
    // only place membership is decided.
    val jmin = (10L * (tPpm - 400000L)) / 6L
    Bounds(threshold,
      3L * jmin - 1000000L, // match floor: o = ⌈l_min·a3/2e6⌉
      3L * jmin - 2000000L) // length band: l₁·1e6 ≥ b3·l₂
  }

  /** (char, occurrence) tokens of each distinct name: "c:k" for the
    * k-th occurrence of c ([[graft.functions.CharOccToks]] — one
    * fused pass per name; the former per-character explode +
    * row_number window paid an exchange + sort of the whole character
    * table just to number occurrences, r18). In: (sid, nm).
    * Out: (sid, nm, tok). */
  private def charToks(dn: DataFrame): DataFrame = dn
    .select(col("sid"), col("nm"),
      explode(graft.functions.CharOccToks(col("nm"))).as("tok"))

  /** Rank tokens rarest-first under the SHARED `freq` order, build the
    * ordered token array, and explode each name's bound-derived
    * prefix. Out: (sid, nm, len, farr, tok). */
  private def prefixTab(occ: DataFrame, freq: DataFrame,
                        b: Bounds): DataFrame = {
    val ranked = occ.join(freq, Seq("tok"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("sid")).orderBy(col("gf"), col("tok"))))
    ranked.groupBy(col("sid")).agg(
        first(col("nm")).as("nm"),
        transform(array_sort(collect_list(struct(col("rnk"), col("tok")))),
          x => x.getField("tok")).as("farr"))
      .withColumn("len", length(col("nm")).cast(LongType))
      // smallest partner length the band allows (≥ 1), then the match
      // floor at that length — both exact ceilings in integer ppm
      .withColumn("lp", greatest(lit(1L),
        expr(s"CAST((len * ${b.b3} + 999999) div 1000000 AS BIGINT)")))
      .withColumn("o",
        expr(s"CAST((lp * ${b.a3} + 1999999) div 2000000 AS BIGINT)"))
      .withColumn("plen", greatest(col("len") - col("o") + 1L, lit(0L)))
      .select(col("sid"), col("nm"), col("len"), col("farr"),
        explode(expr("slice(farr, 1, CAST(plen AS INT))")).as("tok"))
  }

  /** Candidate join + filters + exact verify over two prefix tables.
    * `ordered` adds sid_a < sid_b (self-join form). Out: (sid_a,
    * sid_b, jw). */
  private def verifyPairs(pa: DataFrame, pb: DataFrame, b: Bounds,
                          ordered: Boolean): DataFrame = {
    val cond = col("pa.tok") === col("pb.tok") &&
      (if (ordered) col("pa.sid") < col("pb.sid") else lit(true))
    pa.alias("pa").join(pb.alias("pb"), cond)
      .filter(least(col("pa.len"), col("pb.len")) * 1000000L >=
        lit(b.b3) * greatest(col("pa.len"), col("pb.len")))
      .withColumn("ix", array_intersect(col("pa.farr"), col("pb.farr")))
      .filter(element_at(col("ix"), 1) === col("pa.tok"))
      .filter(size(col("ix")).cast(LongType) * 2000000L >=
        least(col("pa.len"), col("pb.len")) * lit(b.a3))
      .withColumn("jw",
        graft.functions.JaroWinkler(col("pa.nm"), col("pb.nm")))
      .filter(col("jw") >= b.t)
      .select(col("pa.sid").as("sid_a"), col("pb.sid").as("sid_b"),
        col("jw"))
  }

  /** Self-join form. Output with `expandCliques` (default):
    * (id_a, id_b, jw), id_a < id_b, jw rounded to 6. Without it, the
    * 100 TB product shape: distinct-NAME pairs only — (id_a, id_b,
    * jw, n_a, n_b) where each id is its name clique's representative
    * (min member id) and n its clique size, plus one self row
    * (rep, rep, 1.0, n, n) per duplicated non-empty name. k copies of
    * a name cost one row, not k² pairs; the member-expansion joins
    * never run. '''At scale set `expandCliques = false`''' — uniform
    * guidance across the similarity-join family, see
    * [[graft.llm.Dedup.allPairs]]. */
  def selfJoin(df: DataFrame, id: String, text: String,
               threshold: Double,
               expandCliques: Boolean = true): DataFrame = {
    val b = boundsOf(threshold)
    val nm = df.select(col(id).as("nid"), col(text).as("nm"))
    val dn = nm.groupBy("nm").agg(min(col("nid")).as("sid"),
      count(lit(1)).as("n"))
    val occ = charToks(dn)
    val freq = occ.groupBy("tok").agg(count(lit(1)).as("gf"))
    val prefix = prefixTab(occ, freq, b)
    val namePairs = verifyPairs(prefix, prefix, b, ordered = true)
    if (!expandCliques) {
      val szs = dn.select(col("sid"), col("n"))
      val cross = namePairs
        .join(szs.select(col("sid").as("sid_a"), col("n").as("n_a")),
          Seq("sid_a"))
        .join(szs.select(col("sid").as("sid_b"), col("n").as("n_b")),
          Seq("sid_b"))
        // verifyPairs(ordered = true) already guarantees sid_a < sid_b
        .select(col("sid_a").as("id_a"), col("sid_b").as("id_b"),
          round(col("jw"), 6).as("jw"), col("n_a"), col("n_b"))
      // duplicated non-empty names: one self row per clique (jw = 1 ⟺
      // equality; empty/null excluded — jw('','') is 0 by definition)
      val intra = dn.filter(col("n") >= 2 && length(col("nm")) > 0)
        .select(col("sid").as("id_a"), col("sid").as("id_b"),
          lit(1.0).as("jw"), col("n").as("n_a"), col("n").as("n_b"))
      return cross.unionByName(intra)
    }
    val members = nm.join(dn, Seq("nm")).select(col("sid"), col("nid"))
    val cross = namePairs
      .join(members.select(col("sid").as("sid_a"), col("nid").as("ia")),
        Seq("sid_a"))
      .join(members.select(col("sid").as("sid_b"), col("nid").as("ib")),
        Seq("sid_b"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        round(col("jw"), 6).as("jw"))
    // identical strings: jw = 1 ⟺ equality for NON-EMPTY strings, so
    // the clique value is exact by construction and passes any valid
    // threshold. Empty and null names are excluded: the pinned
    // definition (and DuckDB, and JaroWinkler.compute) gives 0.0 when
    // either side is empty and NULL for nulls, so duplicated
    // empty/null names must NOT emit jw = 1 cliques — the length
    // filter drops both (length(null) is null → filter false).
    val validSids = dn.filter(length(col("nm")) > 0).select(col("sid"))
    val membersI = members.join(validSids, Seq("sid"), "left_semi")
    val intra = membersI.alias("x").join(membersI.alias("y"),
        col("x.sid") === col("y.sid") && col("x.nid") < col("y.nid"))
      .select(col("x.nid").as("id_a"), col("y.nid").as("id_b"),
        lit(1.0).as("jw"))
    cross.unionByName(intra)
  }

  /** Cross-corpus form: every (left, right) pair with jw ≥ t. Both
    * inputs use the same `id`/`text` column names (the fuzzyJoin
    * convention); ids are independent namespaces. Output: (id_a from
    * left, id_b from right, jw rounded to 6); with `expandCliques =
    * false`, distinct-name reps + (n_a, n_b), no self rows. '''At
    * scale set `expandCliques = false`''' — uniform guidance across
    * the similarity-join family, see [[graft.llm.Dedup.allPairs]]. */
  def crossJoin(left: DataFrame, right: DataFrame, id: String,
                text: String, threshold: Double,
                expandCliques: Boolean = true): DataFrame = {
    val b = boundsOf(threshold)
    def nmOf(df: DataFrame) =
      df.select(col(id).as("nid"), col(text).as("nm"))
    def dnOf(nm: DataFrame) =
      nm.groupBy("nm").agg(min(col("nid")).as("sid"),
        count(lit(1)).as("n"))
    val nmL = nmOf(left)
    val nmR = nmOf(right)
    val dnL = dnOf(nmL)
    val dnR = dnOf(nmR)
    val occL = charToks(dnL)
    val occR = charToks(dnR)
    // ONE total order over the union — both prefixes must agree on
    // what "rare" means or the shared-token lemma has no footing
    val freq = occL.select(col("tok")).unionByName(occR.select(col("tok")))
      .groupBy("tok").agg(count(lit(1)).as("gf"))
      .localCheckpoint()
    val namePairs = verifyPairs(
      prefixTab(occL, freq, b), prefixTab(occR, freq, b), b,
      ordered = false)
    if (!expandCliques)
      // representative form: one row per qualifying distinct-name
      // pair, carrying each side's clique size — n_a × n_b member
      // pairs are summarized, never materialized
      return namePairs
        .join(dnL.select(col("sid").as("sid_a"), col("n").as("n_a")),
          Seq("sid_a"))
        .join(dnR.select(col("sid").as("sid_b"), col("n").as("n_b")),
          Seq("sid_b"))
        .select(col("sid_a").as("id_a"), col("sid_b").as("id_b"),
          round(col("jw"), 6).as("jw"), col("n_a"), col("n_b"))
    def membersOf(nm: DataFrame, dn: DataFrame) =
      nm.join(dn, Seq("nm")).select(col("sid"), col("nid"))
    namePairs
      .join(membersOf(nmL, dnL).select(col("sid").as("sid_a"),
        col("nid").as("id_a")), Seq("sid_a"))
      .join(membersOf(nmR, dnR).select(col("sid").as("sid_b"),
        col("nid").as("id_b")), Seq("sid_b"))
      .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
  }
}
