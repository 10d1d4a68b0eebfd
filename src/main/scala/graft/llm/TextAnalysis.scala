package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines
  * (additive to the reference surface — north-star scope).
  *
  * Every function is a pure `Column` composition (whole-stage codegen, no
  * UDFs) built only from arithmetic/regex primitives that exist identically
  * in DuckDB, so each op is oracle-checkable bit-for-bit. At 100 TB these
  * are embarrassingly parallel per-row maps — no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace token list, empties dropped (leading/trailing space safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alnum-non-space marks each count as one token — the classic
    * pre-tokenizer split (GPT-2-style word/number/punct classes). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Polynomial rolling hash over characters, mod 2^31-1 — the document
    * fingerprint. Pure integer arithmetic → identical in any engine.
    * fp = foldLeft(chars)(acc -> (acc*31 + codepoint) % 2147483647).
    * Evaluated by the codegen'd [[graft.functions.RollingHash]]
    * expression (one loop over code units; the HOF formulation
    * interpreted 4 nested lambdas per row). */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHash(text)

  /** Rolling hash of a single token (same recurrence) — shared by SimHash,
    * MinHash shingle hashing, and the LSH hyperplanes. */
  def tokenHash(tok: Column): Column =
    graft.functions.RollingHash(tok)

  /** Driver-side replica of [[tokenHash]]/[[fingerprint]] — used to
    * precompute deterministic constants (LSH planes, minhash mixers) that
    * are then embedded as literals in both the Spark plan and the oracle
    * SQL. */
  def rollLocal(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)

  // -------------------------------------------------------------------
  // language ID — n-gram/marker heuristic
  // -------------------------------------------------------------------

  /** Marker patterns per language: script ranges for zh/ru, common
    * function words for the latin-script languages. Counts are
    * regexp-match counts over the lowercased text. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "zh" -> "[\\u4e00-\\u9fff]",
    "ru" -> "[\\u0400-\\u04ff]",
    "es" -> "(?: el | la | de | que | los | una |ñ)",
    "fr" -> "(?: le | les | des | est | dans |à|é)",
    "de" -> "(?: der | die | das | und | ist | nicht )",
    "en" -> "(?: the | and | of | to | in | is )")

  private def score(text: Column, pat: String): Column =
    size(regexp_extract_all(lower(text), lit(pat), lit(0)))

  /** Predicted language: argmax marker score; ties resolve by the fixed
    * order zh,ru,es,fr,de,en; all-zero scores → 'und'. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, p) => l -> score(text, p) }
    val m = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und")) { case ((l, s), rest) =>
      when(m > 0 && s === m, lit(l)).otherwise(rest)
    }
    chain
  }

  // -------------------------------------------------------------------
  // quality scoring — length / punctuation / stopword ratios
  // -------------------------------------------------------------------

  val Stopwords =
    "(?:the|and|of|to|in|is|a|that|it|for|on|with|as|at|by|an|be|this|from|or)"

  /** Component ratios, each rounded to 6 places (round(x,6) is identical
    * IEEE double arithmetic in Spark and DuckDB). */
  def punctRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast(DoubleType) / greatest(length(text), lit(1)), 6)

  def stopwordRatio(text: Column): Column =
    round(size(regexp_extract_all(lower(text),
        lit(s"\\b$Stopwords\\b"), lit(0))).cast(DoubleType) /
      greatest(tokenCountWs(text), lit(1)), 6)

  def avgTokenLen(text: Column): Column =
    round(length(regexp_replace(text, lit("\\s+"), lit("")))
      .cast(DoubleType) / greatest(tokenCountWs(text), lit(1)), 6)

  /** Composite quality score in [0,1]: rational arithmetic only —
    * no exp/log, so engines agree bit-for-bit.
    *   q = 0.4·lenScore + 0.3·stopScore + 0.3·(1 − punctPenalty)
    * where lenScore saturates at 1 for ≥200 chars, stopScore at 0.4
    * stopword ratio, punctPenalty at 0.25 punct ratio. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / lit(200.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) / lit(0.4), lit(1.0))
    val punctPenalty = least(punctRatio(text) / lit(0.25), lit(1.0))
    round(lit(0.4) * lenScore + lit(0.3) * stopScore +
      lit(0.3) * (lit(1.0) - punctPenalty), 6)
  }

  /** Gopher-style repetition signals: the fraction of duplicate words
    * and duplicate word 2-grams per document (high values mark
    * boilerplate/spam that per-document quality scores miss).
    *
    * Shaped as explode → codegen'd count/count_distinct aggregates with
    * bigrams from a per-document lead() window — NOT as nested array
    * expressions: an array_distinct-of-transform tree re-evaluates the
    * interpreted token/shingle lambdas once per reference (~4× per row),
    * which benched 4× slower than this relational form. Two shuffles on
    * the doc key, map-side partial aggregation. */
  def repetition(df: org.apache.spark.sql.DataFrame, id: String,
                 text: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(id).as("doc"),
      posexplode(tokens(lower(col(text)))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc").orderBy("pos")
    val bg = tok.withColumn("next", lead("tok", 1).over(w))
      .filter(col("next").isNotNull)
      .select(col("doc"), concat_ws(" ", col("tok"), col("next")).as("bg"))
    val wa = tok.groupBy("doc").agg(count(lit(1)).as("nw"),
      count_distinct(col("tok")).as("dw"))
    val ba = bg.groupBy("doc").agg(count(lit(1)).as("nb"),
      count_distinct(col("bg")).as("db"))
    def frac(total: Column, distinct: Column): Column =
      round((total - distinct).cast(DoubleType) /
        greatest(total, lit(1)), 6)
    df.select(col(id).as("doc"))
      .join(wa, Seq("doc"), "left_outer")
      .join(ba, Seq("doc"), "left_outer")
      .na.fill(0L, Seq("nw", "dw", "nb", "db"))
      .select(col("doc"), frac(col("nw"), col("dw")).as("dup_word_frac"),
        frac(col("nb"), col("db")).as("dup_bigram_frac"))
  }

  // -------------------------------------------------------------------
  // corpus-level hygiene: vocabulary, duplicated spans, composed filters
  // -------------------------------------------------------------------

  /** Corpus-wide vocabulary counts over lowercased whitespace tokens —
    * the input every tokenizer-training run starts from. One explode +
    * one hash-partitioned groupBy with map-side partial counts; the
    * shuffle carries one (token, count) row per distinct token per
    * partition. Linear at any corpus size. */
  def vocabCounts(df: org.apache.spark.sql.DataFrame,
                  text: String): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(lower(col(text)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))

  /** Distribution drift between two corpus slices: the top-k tokens by
    * absolute parts-per-million rate difference between the slice where
    * `inP` holds and its complement — the monitoring primitive behind
    * "did this crawl/source shift under us" checks. Deliberately
    * INTEGER-exact (counts and floor-ppm rates, like [[mixtureFlags]]'s
    * ppm thresholds) rather than KL/JS floats: a log-sum's value depends
    * on engine summation order, while ppm deltas hash-compare bit-for-
    * bit across engines AND tell the operator WHICH tokens drifted —
    * the actionable part of any drift alarm.
    *
    * Shape at scale: one explode into one map-side-combined groupBy
    * keyed on token (conditional sums — the slice predicate never
    * shuffles separately), then top-k over vocab-sized — not
    * corpus-sized — rows via TakeOrdered. Tie-break on the token string
    * makes the top-k deterministic across engines.
    *
    * Output: (tok, n_p, n_q, ppm_p, ppm_q, delta_ppm), |delta| desc. */
  def tokenDrift(df: org.apache.spark.sql.DataFrame, text: String,
                 inP: Column, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = df
      .select(col(text), inP.as("__graft_p"))
      .select(explode(tokens(lower(col(text)))).as("tok"), col("__graft_p"))
      .groupBy("tok")
      .agg(sum(when(col("__graft_p"), 1L).otherwise(0L)).as("n_p"),
        sum(when(!col("__graft_p"), 1L).otherwise(0L)).as("n_q"))
    val tot = counts.agg(
      sum(col("n_p")).as("t_p"), sum(col("n_q")).as("t_q"))
    counts.crossJoin(broadcast(tot))
      .select(col("tok"), col("n_p"), col("n_q"),
        // integer `div`, not `/`: Spark's / on BIGINT returns DOUBLE,
        // and floor-of-double drifts from exact long division at scale
        expr("n_p * CAST(1000000 AS BIGINT) div greatest(t_p, CAST(1 AS BIGINT))")
          .as("ppm_p"),
        expr("n_q * CAST(1000000 AS BIGINT) div greatest(t_q, CAST(1 AS BIGINT))")
          .as("ppm_q"))
      .withColumn("delta_ppm", col("ppm_p") - col("ppm_q"))
      .orderBy(abs(col("delta_ppm")).desc, col("tok"))
      .limit(k)
  }

  /** Duplicate-span coverage: the fraction of a document's DISTINCT word
    * n-gram shingles that also occur in at least one OTHER document —
    * the per-document signal substring-level dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better") acts
    * on. High coverage marks documents assembled from corpus-common
    * spans even when no single whole-document near-dup exists.
    *
    * Shingles are 64-bit rolling hashes (shuffle carries longs); the
    * document-frequency aggregate and the join back are both linear in
    * distinct (doc, shingle) volume. */
  def dupSpanFraction(df: org.apache.spark.sql.DataFrame, id: String,
                      text: String, n: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val sh = Dedup.shingleRows(df, id, text, n)
      .select(col("doc"), tokenHash(col("sh")).as("h"))
      .distinct()
    val freq = sh.groupBy("h").agg(count(lit(1)).as("ndocs"))
    sh.join(freq, Seq("h"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc"), col("n_spans"), col("n_dup"),
        round(col("n_dup").cast(DoubleType) /
          greatest(col("n_spans"), lit(1L)), 6).as("dup_span_frac"))
  }

  /** The composed C4/Gopher-style keep/drop decision: language allowlist,
    * quality floor, repetition caps, token-count bounds — one row per
    * document with per-gate flags (so a pipeline can report WHY a
    * document dropped) and the conjunction as `keep`. The per-row gates
    * are map-only; [[repetition]] contributes the only shuffles (two, on
    * the doc key). */
  def filterPipeline(df: org.apache.spark.sql.DataFrame, id: String,
                     text: String,
                     minQuality: Double = 0.5,
                     maxDupWord: Double = 0.3,
                     maxDupBigram: Double = 0.2,
                     minTokens: Long = 10L,
                     maxTokens: Long = 100000L,
                     langs: Seq[String] = Seq("en"))
      : org.apache.spark.sql.DataFrame = {
    val base = df.select(col(id).as("doc"),
      langId(col(text)).as("lang"),
      qualityScore(col(text)).as("quality"),
      tokenCountBpe(col(text)).cast(LongType).as("n_tokens"))
    base.join(repetition(df, id, text), Seq("doc"))
      .withColumn("lang_ok", col("lang").isInCollection(langs))
      .withColumn("quality_ok", col("quality") >= minQuality)
      .withColumn("repetition_ok",
        col("dup_word_frac") <= maxDupWord &&
          col("dup_bigram_frac") <= maxDupBigram)
      .withColumn("length_ok",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("keep",
        col("lang_ok") && col("quality_ok") &&
          col("repetition_ok") && col("length_ok"))
  }

  // -------------------------------------------------------------------
  // dataset assembly: splits, PII redaction, context packing
  // -------------------------------------------------------------------

  /** Deterministic train/val/test assignment by id hash — the
    * reproducible split every training pipeline needs (Bernoulli
    * `sample()` is seed- and partitioning-dependent; a content hash
    * moves documents between splits when text is cleaned). Salted so
    * the split is independent of other id-hash uses. Map-only. */
  def splitAssign(id: Column, trainPct: Int = 80,
                  valPct: Int = 10): Column = {
    val h = pmod(graft.functions.RollingHash(
      concat(lit("split:"), id.cast(StringType))), lit(100))
    when(h < trainPct, lit("train"))
      .when(h < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified sampling: a row keeps iff its salted id
    * hash falls under its stratum's rate (in basis points of 10,000 —
    * exact integer thresholds, no float compare). The data-mixing
    * primitive: up-/down-weight languages or sources reproducibly,
    * independent of partitioning and immune to the content edits that
    * move rows under Bernoulli `sample()`. Map-only; emits the keep
    * flag so the decision is auditable. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, id: String,
                       stratum: String, rates: Map[String, Double],
                       defaultRate: Double = 0.0)
      : org.apache.spark.sql.DataFrame = {
    val h = pmod(graft.functions.RollingHash(
      concat(lit("sample:"), col(id).cast(StringType))), lit(10000))
    val bps = rates.toSeq.sortBy(_._1).foldLeft(
        lit(math.round(defaultRate * 10000).toInt)) {
      case (acc, (k, v)) =>
        when(col(stratum) === k, lit(math.round(v * 10000).toInt))
          .otherwise(acc)
    }
    df.select(col(id).as("doc"), col(stratum).as("stratum"),
      (h < bps).as("keep"))
  }

  /** Square-root (temperature τ = 0.5) mixture resampling: cap each
    * stratum at ⌈rate·√n_s⌉ documents — big sources are downweighted
    * sublinearly, small ones kept nearly whole, the standard
    * multilingual-corpus balancing curve (cf. the exponent-smoothed
    * sampling of multilingual pretraining). Unlike
    * [[stratifiedSample]] (caller-fixed per-stratum rates) the rate
    * here DERIVES from the observed stratum size.
    *
    * Selection is deterministic: rank by the shared rolling hash
    * (id tie-break) within each stratum and keep the top target_s.
    * target_s = least(n_s, ceil(rate·sqrt(n_s))) uses only
    * correctly-rounded IEEE ops on a per-stratum scalar — no
    * cross-stratum float sum anywhere, so the threshold can never
    * flip between engines.
    *
    * Shape at scale: one tiny groupBy(stratum) count that broadcasts
    * back, one exchange+sort per stratum for the rank — the sort is
    * the price of EXACT per-stratum counts (hash-thresholding is
    * cheaper but only approximates the target; that path is
    * [[stratifiedSample]]). */
  def sqrtSample(df: org.apache.spark.sql.DataFrame, id: String,
                 stratum: String, rate: Double)
      : org.apache.spark.sql.DataFrame = {
    require(rate > 0, s"rate must be positive: $rate")
    val counts = df.groupBy(col(stratum).as("stratum"))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(graft.functions.RollingHash(
        concat(lit("tsample:"), col("doc").cast(StringType))).asc,
        col("doc").asc)
    df.select(col(id).as("doc"), col(stratum).as("stratum"))
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(counts), Seq("stratum"))
      .filter(col("__rk") <=
        least(col("__n"), ceil(lit(rate) * sqrt(col("__n")))))
      .select(col("doc"), col("stratum"))
  }

  /** Word-frequency table of a corpus: (w, cnt) — THE intermediate
    * every tokenizer-training step runs on. One corpus pass (explode +
    * one shuffled count); everything downstream is vocab-sized, which
    * is what keeps BPE iteration affordable at 100 TB (the corpus is
    * never re-read during training). */
  def wordCounts(df: org.apache.spark.sql.DataFrame,
                 text: String): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(lower(col(text)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent-symbol pair counts over the word-frequency table, with
    * `merges` applied first ([[graft.functions.BpeSymbols]]) — the
    * quantity BPE maximizes at each step. Deterministic total order
    * (count desc, then pair) so top-k prefixes are engine-stable.
    * Single-symbol words contribute no pairs. */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, text: String,
                    merges: Seq[(String, String)] = Nil)
      : org.apache.spark.sql.DataFrame = {
    val syms = graft.functions.BpeSymbols(col("w"), merges)
    wordCounts(df, text)
      .select(col("cnt"), syms.as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("cnt"),
        explode(sequence(lit(1), size(col("s")) - 1)).as("i"), col("s"))
      .select(element_at(col("s"), col("i")).as("l"),
        element_at(col("s"), col("i") + 1).as("r"), col("cnt"))
      .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("l"), col("r"))
  }

  /** Byte-pair-encoding vocabulary induction: `numMerges` greedy merge
    * steps, each taking the most frequent adjacent symbol pair (ties →
    * lexicographically smallest pair, so training is deterministic
    * across partitionings and engines). Returns (l, r, count) in merge
    * order — the model artifact a tokenizer ships.
    *
    * Scale shape: ONE corpus pass builds the word-frequency table
    * ([[wordCounts]], checkpointed); each merge step re-derives symbols
    * from the word via the native [[graft.functions.BpeSymbols]] (all
    * accumulated merges in one pass) and re-counts pairs with a
    * vocab-sized aggregate. Only the single top pair crosses to the
    * driver per step — model state, like the k-means centroids. The
    * iterative selection policy is pinned by a hand-computed LlmSpec
    * case; the pair-counting machinery is driver-compared exactly
    * (`ta_bpe_pairs`). */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, text: String,
               numMerges: Int): Seq[(String, String, Long)] = {
    val wc = wordCounts(df, text).localCheckpoint()
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (acc.length < numMerges && !done) {
      val merges = acc.map(m => (m._1, m._2)).toSeq
      val syms = graft.functions.BpeSymbols(col("w"), merges)
      val top = wc.select(col("cnt"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(1), size(col("s")) - 1)).as("i"), col("s"))
        .select(element_at(col("s"), col("i")).as("l"),
          element_at(col("s"), col("i") + 1).as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        acc += ((r.getString(0), r.getString(1), r.getLong(2)))
      }
    }
    acc.toSeq
  }

  /** Id-ordered encode vocabulary: base symbols (sorted) then merge
    * products in merge order; a symbol's position is its id, first
    * occurrence wins on duplicates (two merges CAN produce the same
    * string — ("ab","c") and ("a","bc") both yield "abc"). */
  def bpeVocab(base: Seq[String],
               merges: Seq[(String, String)]): Seq[String] =
    (base.sorted ++ merges.map(m => m._1 + m._2)).distinct

  /** Encode each document to BPE token ids: tokenize with the SAME
    * `tokens(lower(text))` every text operator uses, apply the merge
    * list per word, map symbols through `vocab` (position = id, -1 =
    * UNK), flatten in document order → `array<int>` — the column a
    * training pipeline writes. Map-only
    * ([[graft.functions.BpeEncodeIds]] with the merge list and id map
    * as reference objects): encoding is an embarrassingly parallel
    * projection at any corpus scale. */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, doc: String,
                text: String, merges: Seq[(String, String)],
                vocab: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(col(doc).as("doc"),
      graft.functions.BpeEncodeIds(
        tokens(lower(col(text))), merges, vocab).as("ids"))

  /** Canonical text cleanup, the step that runs BEFORE any hash-based
    * operator (dedup signatures, fingerprints, exact-dedup keys are all
    * byte-sensitive): Unicode NFC composition
    * ([[graft.functions.NormalizeNfc]] — no Spark built-in), control
    * characters stripped (except \n and \t), spaces/tabs collapsed to
    * one space, ends trimmed. Map-only; DuckDB's nfc_normalize mirrors
    * the NFC step so the whole pipeline is oracle-comparable. */
  def normalize(text: Column): Column = {
    val nfc = graft.functions.NormalizeNfc(text)
    val noCtl = regexp_replace(nfc,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    trim(regexp_replace(noCtl, "[ \\t]+", " "))
  }

  /** Rebalance a corpus to TARGET OUTPUT PROPORTIONS — the data-mixing
    * step that turns "70% web / 20% code / 10% books" into per-stratum
    * acceptance rates. [[stratifiedSample]] takes rates as given; this
    * operator derives them: the largest feasible output size that
    * honors every declared weight without upsampling is set by the
    * BINDING stratum (`total = min_d floor(count_d · 10000 / wbps_d)`),
    * each stratum takes `floor(wbps_d · total / 10000)` docs, and rows
    * are admitted by salted id-hash threshold at
    * `floor(take_d · 10⁶ / count_d)` parts-per-million.
    *
    * All arithmetic is 64-bit integer (weights in basis points, rates
    * in ppm) so any engine reproduces the thresholds bit-for-bit — no
    * float division anywhere. Strata not in `weightsBps` are dropped
    * (weight 0). Two passes: one count aggregate whose result is
    * driver-side model state (one row per DECLARED stratum — never
    * data-sized), then a map-only flag projection with the rates
    * embedded as a literal CASE. The admit decision is per-row and
    * partitioning-independent, so the sample is reproducible across
    * cluster sizes and survives repartitioning — same property as
    * [[stratifiedSample]].
    *
    * Output: (doc, stratum, rate_ppm, keep) for rows of declared
    * strata. Expected kept count per stratum = take_d ± binomial noise
    * (hash thresholds admit each row independently; exact-count
    * selection would need a per-stratum rank — a shuffle this operator
    * deliberately avoids). */
  def mixtureBalance(df: org.apache.spark.sql.DataFrame, id: String,
                     stratum: String, weightsBps: Map[String, Int])
      : org.apache.spark.sql.DataFrame = {
    require(weightsBps.nonEmpty &&
      weightsBps.values.forall(w => w > 0 && w <= 10000),
      "weights must be in (0, 10000] basis points")
    val declared = weightsBps.keys.toSeq.sorted
    val counts = df.filter(col(stratum).isin(declared: _*))
      .groupBy(col(stratum)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no rows in any declared stratum")
    val total = declared.flatMap(d =>
      counts.get(d).map(c => c * 10000L / weightsBps(d))).min
    val ratePpm: Map[String, Long] = declared.map { d =>
      val c = counts.getOrElse(d, 0L)
      val take = weightsBps(d) * total / 10000L
      d -> (if (c == 0) 0L else take * 1000000L / c)
    }.toMap
    val rateCol = declared.foldLeft(lit(0L)) { (acc, d) =>
      when(col(stratum) === d, lit(ratePpm(d))).otherwise(acc)
    }
    val h = pmod(graft.functions.RollingHash(
      concat(lit("mix:"), col(id).cast(StringType))), lit(1000000))
    df.filter(col(stratum).isin(declared: _*))
      .select(col(id).as("doc"), col(stratum).as("stratum"),
        rateCol.as("rate_ppm"), (h < rateCol).as("keep"))
  }

  /** Greedy token-budget selection: the highest-quality documents whose
    * cumulative token count fits `budgetTokens` (order: quality desc,
    * id asc — the deterministic data-mixing prefix rule). Equivalent to
    * a global quality-ordered running sum, computed WITHOUT a global
    * single-partition window: a 1,001-bucket quality histogram (one
    * aggregate; model-sized driver state, like k-means centroids) finds
    * the crossing bucket; buckets above it select wholesale, and the
    * crossing bucket's residents run a RANGE-PARTITIONED two-phase
    * cumsum (per-partition window + driver-side partition offsets)
    * against the leftover budget — so even a corpus where every row
    * shares one quality value never sees a single-partition window.
    * Identical output to the naive global window at any scale. */
  def budgetSelect(df: org.apache.spark.sql.DataFrame, id: String,
                   text: String, budgetTokens: Long)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the regex-heavy scoring projection is referenced three times
    // (histogram + both selection branches) — materialize the narrow
    // (doc, quality, n_tokens, qb) form once; blocks are released by the
    // ContextCleaner when the result is dropped
    val scoredAll = df.select(col(id).as("doc"),
      qualityScore(col(text)).as("quality"),
      tokenCountBpe(col(text)).cast(LongType).as("n_tokens"))
      .withColumn("qb", floor(col("quality") * 1000).cast(IntegerType))
      .localCheckpoint()
    // a NULL-text row has no token count (and least() quietly skips the
    // null quality components, so qb alone is NOT a null marker): it
    // cannot be selected and must not reach the histogram — the driver
    // read of the null bucket sum NPE'd (r11 sweep finding). It
    // re-enters the output below with selected = false so the flag
    // stays one row per input
    val ok = col("qb").isNotNull && col("n_tokens").isNotNull
    val scored = scoredAll.filter(ok)
    val nullRows = scoredAll.filter(!ok)
      .withColumn("selected", lit(false))
    val hist = scored.groupBy("qb").agg(sum("n_tokens").as("toks"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    var acc = 0L
    var cut = Int.MinValue
    var remaining = 0L
    val it = hist.iterator
    var crossed = false
    while (it.hasNext && !crossed) {
      val (qb, toks) = it.next()
      if (acc + toks <= budgetTokens) acc += toks
      else { cut = qb; remaining = budgetTokens - acc; crossed = true }
    }
    val out =
      if (!crossed)
        scored.withColumn("selected", lit(true))
      else {
        // Residual cumsum WITHOUT a global single-partition window. The
        // histogram bounds the residual to one of 1,001 QUALITY buckets,
        // which is no bound on DATA: a constant-quality corpus routes
        // ~100% of rows through this branch, and a bare
        // Window.orderBy(...) would move them all to one partition — the
        // exact global sort this operator exists to avoid. Instead:
        // range-partition on the selection order, cumsum within each
        // partition, then add per-partition prefix offsets (≤P totals —
        // model-sized driver state, like the histogram itself). Exact
        // for any input: (quality desc, doc asc) is a strict total
        // order, so the split points cannot change the prefix sums.
        val ord = Seq(col("quality").desc, col("doc").asc)
        val p = scored.sparkSession.sessionState.conf.numShufflePartitions
        // localCheckpoint freezes the sampled range bounds: the pid
        // column must be identical in the offsets job and the cumsum job
        val parts = scored.filter(col("qb") === cut)
          .repartitionByRange(p, ord: _*)
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val ptots = parts.groupBy("pid").agg(sum("n_tokens").as("ptot"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val offsets = ptots.scanLeft((Int.MinValue, 0L)) {
          case ((_, acc2), (pid, ptot)) => (pid, acc2 + ptot)
        }.sliding(2).collect { case Array((_, prior), (pid, _)) =>
          (pid, prior)
        }.toArray
        val offset = offsets.foldLeft(lit(0L)) { case (acc2, (pid, off)) =>
          when(col("pid") === pid, lit(off)).otherwise(acc2)
        }
        val wIn = Window.partitionBy(col("pid")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val residual = parts
          .withColumn("cum", sum(col("n_tokens")).over(wIn) + offset)
          .withColumn("selected", col("cum") <= remaining)
          .drop("cum", "pid")
        scored.filter(col("qb") =!= cut)
          .withColumn("selected", col("qb") > cut)
          .unionByName(residual)
      }
    out.unionByName(nullRows)
      .select(col("doc"), col("quality"), col("n_tokens"), col("selected"))
  }

  /** PII patterns — email addresses and phone-like digit runs. Both are
    * RE2-safe (no backtracking constructs), so the DuckDB oracle runs
    * the identical pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Redact emails then phone-like runs. Map-only regexp_replace
    * (replace-all in both engines). */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** How many PII spans [[redact]] would remove. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit(0)))

  /** Context-window packing: assign documents to fixed-token-budget
    * shards, greedy in id order. Runs in `nGroups` INDEPENDENT packing
    * groups (id-hash bucketed) so the cumulative-sum window never needs
    * a global single-partition sort — each group packs in parallel and
    * the shard id namespaces as group·2^32 + local shard. A document
    * whose exclusive running total crosses the budget boundary starts
    * the next local shard (block-packing approximation: long documents
    * may exceed one budget, as pretraining block packing accepts).
    * Output: (doc, n_tokens, shard, offset) — offset is the document's
    * start position within its shard's token stream. */
  /** BM25 relevance scoring of every document against a fixed query —
    * the classic lexical retrieval/reranking scorer (and the usual
    * hard-negative miner next to the ANN index). Corpus statistics
    * (N, avgdl, per-term document frequency) are computed ONCE in one
    * aggregate pass and baked into the scoring projection as literals —
    * "train once, serve as a map", the same shape as the ANN model
    * queries: scoring 100 TB is then a pure scan, and the stats job
    * touches only token counts (column-pruned).
    *
    * score(d) = Σ_t ln(1 + (N−df_t+0.5)/(df_t+0.5)) ·
    *            tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * — the standard Robertson/Sparck-Jones idf (always positive) with
    * Okapi saturation. Output: (doc, dl, score rounded to 6 places,
    * for engine-portable float comparison). */
  def bm25(df: org.apache.spark.sql.DataFrame, id: String, text: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
    // one stats job: N and avgdl from a count/avg aggregate, per-term
    // df from a distinct-token explode filtered to the query terms.
    // avg over an EMPTY corpus is NULL — coalesce to 1 so the degenerate
    // input scores an empty frame instead of NPE-ing at train time (the
    // EmptyInputSpec contract: the first partition of a 100 TB run is
    // routinely empty)
    val g = toks.agg(count(lit(1)),
      coalesce(avg(size(col("__ws"))), lit(1.0))).head()
    val n = g.getLong(0)
    val avgdl = g.getDouble(1)
    val dfs: Map[String, Long] = toks
      .select(explode(array_distinct(col("__ws"))).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dl = size(col("__ws")).cast("double")
    val score = queryTerms.map { t =>
      val dft = dfs.getOrElse(t, 0L).toDouble
      val idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
      val tf = size(filter(col("__ws"), x => x === lit(t))).cast("double")
      lit(idf) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    toks.select(col("doc"), dl.cast("int").as("dl"),
      round(score, 6).as("score"))
  }

  /** Overlapping token chunker (RAG-style indexing): each document
    * splits into windows of `chunkSize` whitespace tokens starting
    * every `chunkSize - overlap` tokens, the last window short. A
    * map-only projection (explode + slice — no shuffle, no state):
    * chunking 100 TB is exactly a scan. Documents with zero tokens
    * produce zero chunks. Output: (doc, chunk_idx, n_tokens, chunk). */
  def chunk(df: org.apache.spark.sql.DataFrame, id: String, text: String,
            chunkSize: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0),
        ((col("__n") - 1) / stride).cast("int"))))
      .select(col("doc"), col("chunk_idx"),
        least(col("__n") - col("chunk_idx") * stride, lit(chunkSize))
          .as("n_tokens"),
        array_join(slice(col("__ws"), col("chunk_idx") * stride + 1,
          lit(chunkSize)), " ").as("chunk"))
  }

  /** Unigram language-model quality scoring — the in-engine form of
    * the classic LM-based filter (CCNet scores with a pretrained KenLM
    * 5-gram; the unigram case keeps the identical pipeline shape with a
    * model trainable in ONE pass). Train: token counts over the corpus
    * (explode → map-side-combined groupBy — the model table, vocab-
    * bound not corpus-bound). Score: per-doc distinct-term frequencies
    * equi-join the model, then
    *   nll(d) = − Σ_w tf_w · ln((c_w + 1) / (T + V)) / |d|
    * (add-one smoothing over the observed vocab). The model stays
    * distributed — nothing corpus-sized reaches the driver; only the
    * two scalars T and V do. Scoring 100 TB is a join whose build side
    * is the vocabulary. Lower = more typical of the corpus; the filter
    * convention is dropping the high-nll tail.
    * Output: (doc, n_tokens, nll rounded to 6 — engine-portable). */
  def unigramScore(df: org.apache.spark.sql.DataFrame, id: String,
                   text: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
      .filter(size(col("__ws")) > 0)
    val wc = toks.select(explode(col("__ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // sum over an EMPTY corpus is NULL — coalesce so the degenerate
    // input scores nothing instead of throwing at train time
    val g = wc.agg(coalesce(sum(col("c")), lit(0L)), count(lit(1))).head()
    val denom = (g.getLong(0) + g.getLong(1)).toDouble // T + V
    val tf = toks
      .select(col("doc"), size(col("__ws")).as("n"), explode(col("__ws")).as("w"))
      .groupBy(col("doc"), col("n"), col("w")).agg(count(lit(1)).as("tf"))
    tf.join(wc, "w")
      .groupBy(col("doc"), col("n"))
      .agg(round(-sum(col("tf").cast(DoubleType) *
          log((col("c").cast(DoubleType) + lit(1.0)) / lit(denom))) /
        col("n").cast(DoubleType), 6).as("nll"))
      .select(col("doc"), col("n").as("n_tokens"), col("nll"))
  }

  /** Bigram language-model scoring — one Markov order up from
    * [[unigramScore]], the cheapest model that notices scrambled word
    * ORDER (a bag-of-words spam page and fluent prose share unigram
    * stats; their transition likelihoods differ sharply). Two model
    * tables train in one explode pass each, both vocab-bound:
    * context counts c(w1) (tokens in positions 1..n−1) and adjacent
    * pair counts c(w1,w2). Scoring:
    *   nll(d) = − Σ_{adjacent (w1,w2)} ln((c(w1,w2)+1)/(c(w1)+V)) / (n−1)
    * with V = corpus vocabulary size (the [[unigramScore]] convention).
    * The pair explode is map-only (element_at over the row's own
    * tokens — no window, no shuffle); the model joins are equi-joins
    * whose build side is the vocabulary. Unseen pairs (scoring a corpus
    * the model wasn't trained on) fall back to the +1 numerator with
    * c=0. Documents need ≥ 2 tokens. Output: (doc, n_tokens, nll). */
  def bigramScore(df: org.apache.spark.sql.DataFrame, id: String,
                  text: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
      .filter(size(col("__ws")) > 1)
    val pairs = toks
      .select(col("doc"), size(col("__ws")).as("n"),
        explode(sequence(lit(1), size(col("__ws")) - 1)).as("i"),
        col("__ws"))
      .select(col("doc"), col("n"),
        element_at(col("__ws"), col("i")).as("w1"),
        element_at(col("__ws"), col("i") + 1).as("w2"))
    val ctx = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val v = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
      .select(explode(col("__ws")).as("w")).agg(countDistinct(col("w")))
      .head().getLong(0)
    val tf = pairs.groupBy(col("doc"), col("n"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    tf.join(big, Seq("w1", "w2"), "left").join(ctx, Seq("w1"))
      .groupBy(col("doc"), col("n"))
      .agg(round(-sum(col("tf").cast(DoubleType) *
          log((coalesce(col("c12"), lit(0L)).cast(DoubleType) + lit(1.0)) /
            (col("c1").cast(DoubleType) + lit(v.toDouble)))) /
        (col("n") - lit(1)).cast(DoubleType), 6).as("nll"))
      .select(col("doc"), col("n").as("n_tokens"), col("nll"))
  }

  /** Feature hashing with TF-IDF weighting (the "hashing trick",
    * Weinberger et al. 2009): token → bucket via the shared rolling
    * hash mod `dim`, so featurization needs NO vocabulary dictionary —
    * the train-free text embedding that linear classifiers
    * (fastText-style quality models) consume. Sparse output
    * (doc, dim, tf, tfidf), tfidf = tf · (ln((N+1)/(df_b+1)) + 1)
    * (the smoothed-idf convention).
    *
    * Shape at scale: one explode → groupBy(doc, bucket) for tf
    * (map-side combined); bucket document frequencies are a
    * dim-bounded second aggregate that broadcasts back; N is the one
    * driver scalar. No vocabulary table, no dictionary join — the
    * whole featurizer is two partial-aggregated passes. */
  def hashTfidf(df: org.apache.spark.sql.DataFrame, id: String,
                text: String, dim: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val n = df.count()
    val tf = df.select(col(id).as("doc"), explode(tokens(col(text))).as("tok"))
      .select(col("doc"), pmod(tokenHash(col("tok")), lit(dim)).as("dim"))
      .groupBy(col("doc"), col("dim")).agg(count(lit(1)).as("tf"))
    val dfb = tf.groupBy(col("dim")).agg(count(lit(1)).as("dfb"))
    tf.join(broadcast(dfb), Seq("dim"))
      .select(col("doc"), col("dim"), col("tf"),
        round(col("tf").cast(DoubleType) *
          (log(lit((n + 1).toDouble) / (col("dfb").cast(DoubleType) + 1.0))
            + lit(1.0)), 6).as("tfidf"))
  }

  def packShards(df: org.apache.spark.sql.DataFrame, id: String,
                 text: String, budget: Long,
                 nGroups: Int = 16): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(id).as("doc"), col(text).as("t"))
      .withColumn("grp", pmod(graft.functions.RollingHash(
        concat(lit("pack:"), col("doc").cast(StringType))), lit(nGroups)))
      .withColumn("n_tokens", tokenCountBpe(col("t")).cast(LongType))
      .withColumn("cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc"), col("n_tokens"),
        // `div`, not `/`: long `/` is DOUBLE division and a quotient an
        // ulp under an integer would truncate into the wrong shard at
        // large cumulative offsets (the oracle's `//` is exact)
        (col("grp").cast(LongType) * lit(4294967296L) +
          expr(s"cum div ${budget}L")).as("shard"),
        (col("cum") % lit(budget)).as("offset"))
  }

  // -------------------------------------------------------------------
  // linear quality classifier (fasttext-style) over hashed features
  // -------------------------------------------------------------------

  /** Hashed bag-of-features: unigrams plus adjacent-token bigrams
    * (joined with '_'), each rolled through [[tokenHash]] into `dim`
    * buckets — the fastText featurization (Joulin et al. 2016), which
    * is what production quality/toxicity filters for pretraining
    * corpora actually run (CCNet's fastText quality scorer). Pure
    * integer hashing → both the features and any integer-weight score
    * over them replay bit-for-bit in an oracle engine.
    *
    * Shape at scale: one map-only explode (tokens + bigrams ≈ 2×
    * token count) → groupBy(doc, dim) with map-side combine. No
    * vocabulary table — the hashing trick is the point: the feature
    * space is fixed at `dim` regardless of corpus size.
    *
    * Output: (doc, dim, cnt). */
  def hashedFeatures(df: org.apache.spark.sql.DataFrame, id: String,
                     text: String,
                     dim: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val ws = tokens(lower(col(text)))
    val bigrams = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit("_"), b))
    df.select(col(id).as("doc"),
        explode(concat(ws, bigrams)).as("f"))
      .select(col("doc"), pmod(tokenHash(col("f")), lit(dim)).as("dim"))
      .groupBy("doc", "dim").agg(count(lit(1)).as("cnt"))
  }

  /** Linear score over hashed features: margin(doc) = Σ cnt·w(dim).
    * `weights` is a (dim, w) table — model-sized, broadcast — so one
    * broadcast join + one partial-aggregated groupBy scores any
    * corpus; with integer weights the margin is an exact BIGINT.
    * Docs absent from `feats` (no tokens) are absent from the output,
    * matching the featurizer. Output: (doc, margin). */
  def scoreLinear(feats: org.apache.spark.sql.DataFrame,
                  weights: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    feats.join(broadcast(weights), Seq("dim"))
      .groupBy("doc").agg(sum(col("cnt") * col("w")).as("margin"))

  /** Batch-gradient logistic regression on hashed features — the
    * training half of the quality classifier. Each iteration is two
    * key-partitioned shuffles (margin per doc, gradient per dim) and
    * one model-sized collect; the driver holds only the `dim`-length
    * weight vector, never data. Labels: (doc, y) with y ∈ {0, 1}.
    * Returns the weight vector indexed by feature bucket.
    *
    * Determinism note: float gradient sums reduce in partition order,
    * so weights are reproducible only up to float-sum reordering —
    * which is why the engine's COMPARED serving row uses fixed
    * integer weights, and training is pinned by behavior (separable
    * data → accuracy) in the spec, the k-means/ivfTrain convention. */
  def trainLogistic(feats: org.apache.spark.sql.DataFrame,
                    labels: org.apache.spark.sql.DataFrame,
                    dim: Int, iters: Int = 20,
                    lr: Double = 0.5): Array[Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val f = feats.join(labels, Seq("doc"))
      .select(col("doc"), col("dim"), col("cnt").cast(DoubleType),
        col("y").cast(DoubleType))
      .localCheckpoint()
    val n = math.max(f.select(col("doc")).distinct().count(), 1L)
    var w = new Array[Double](dim)
    for (_ <- 1 to iters) {
      val wDf = broadcast(w.toSeq.zipWithIndex
        .map { case (v, i) => (i, v) }.toDF("dim", "w"))
      val grad = f.join(wDf, Seq("dim"))
        .groupBy("doc").agg(
          sum(col("cnt") * col("w")).as("m"),
          first(col("y")).as("y"),
          collect_list(struct(col("dim"), col("cnt"))).as("fs"))
        .select(explode(col("fs")).as("f"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
        .groupBy(col("f.dim").as("dim"))
        .agg(sum(col("f.cnt") * col("r")).as("g"))
        .collect()
      val step = lr / n
      grad.foreach(row =>
        // dim arrives as the feature bucket's LONG (pmod of a long hash)
        w(row.getAs[Long]("dim").toInt) -= step * row.getAs[Double]("g"))
    }
    w
  }

  // -------------------------------------------------------------------
  // trained language ID — char n-grams × one-vs-rest linear classifier
  // -------------------------------------------------------------------

  /** Hashed char-n-gram bag — the fastText language-ID featurization
    * (langid.py / fastText lid.176 both run on char n-grams: function
    * words alone miss short strings and agglutinative languages).
    * Grams are substrings of the LOWERCASED text at every position,
    * rolled through [[tokenHash]] into `dim` buckets — pure integer
    * hashing, replayable in the oracle engine. Texts shorter than `n`
    * chars produce no rows (the [[hashedFeatures]] empty-doc
    * convention).
    *
    * Shape at scale: the whole featurization is ONE fused map-only
    * expression ([[graft.functions.CharGramBuckets]] — r18): each
    * doc's bucket counts accumulate in a single allocation-free pass
    * over its code units, then a dim-bounded posexplode emits the
    * non-zero buckets. No per-position row is ever generated, no
    * per-gram string allocated, and no corpus-positions-sized
    * aggregate runs — the former spelling (position explode →
    * substring+hash per gram → groupBy(doc, dim)) paid all three for
    * value-identical rows. Feature space fixed at `dim` regardless of
    * corpus size. Output: (doc, dim, cnt). */
  def charGramFeatures(df: org.apache.spark.sql.DataFrame, id: String,
                       text: String, n: Int = 3,
                       dim: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(dim > 0, s"dim must be positive: $dim")
    df.select(col(id).as("doc"), lower(col(text)).as("__t"))
      .filter(length(col("__t")) >= n)
      .select(col("doc"), posexplode(
        graft.functions.CharGramBuckets(col("__t"), n, dim)))
      .filter(col("col") > 0)
      .select(col("doc"), col("pos").cast(LongType).as("dim"),
        col("col").as("cnt"))
  }

  /** Multi-class linear serving: per-(doc, class) margin = Σ cnt·w,
    * prediction = argmax margin with ties to the alphabetically first
    * class — min(struct(−margin, lang)) makes the argmax ONE exact
    * comparison chain, deterministic in any engine (with integer
    * weights the margins are exact BIGINTs). `weights` is the
    * model-sized (lang, dim, w) table, broadcast; the corpus-sized
    * side shuffles once on doc for the margin agg and once for the
    * argmax — both key-partitioned, nothing collected.
    * Output: (doc, margin, lang_pred). */
  def langidServe(feats: org.apache.spark.sql.DataFrame,
                  weights: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    feats.join(broadcast(weights), Seq("dim"))
      .groupBy(col("doc"), col("lang"))
      .agg(sum(col("cnt") * col("w")).as("margin"))
      .groupBy(col("doc"))
      .agg(min(struct((-col("margin")).as("nm"), col("lang"),
        col("margin"))).as("b"))
      .select(col("doc"), col("b.margin").as("margin"),
        col("b.lang").as("lang_pred"))

  /** One-vs-rest training over [[charGramFeatures]]: a
    * [[trainLogistic]] run per language (label 1 = this language).
    * Returns the (lang, dim, w) weight table [[langidServe]] consumes.
    * Float weights — the deterministic COMPARED row serves fixed
    * integer weights instead (the [[trainLogistic]] determinism
    * note); training is behavior-pinned in LlmSpec against the
    * marker-argmax toy ([[langId]]). */
  def langidTrain(df: org.apache.spark.sql.DataFrame, id: String,
                  text: String, label: String, langs: Seq[String],
                  n: Int = 3, dim: Int = 256, iters: Int = 20,
                  lr: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats = charGramFeatures(df, id, text, n, dim).localCheckpoint()
    val rows = langs.flatMap { lang =>
      val labels = df.select(col(id).as("doc"),
        (col(label) === lang).cast("int").as("y"))
      trainLogistic(feats, labels, dim, iters, lr)
        .zipWithIndex.map { case (w, i) => (lang, i.toLong, w) }
    }
    rows.toDF("lang", "dim", "w")
  }

  // -------------------------------------------------------------------
  // DSIR-style importance weights — data selection by domain log-ratio
  // -------------------------------------------------------------------

  /** Importance weights for Data Selection via Importance Resampling
    * (Xie et al. 2023): score every RAW document by how much more
    * likely a TARGET-domain hashed n-gram model finds it than the raw
    * model does,
    *   logw(d) = Σ_b tf_d(b) · [ln((c_t(b)+1)/(T_t+D)) −
    *                            ln((c_r(b)+1)/(T_r+D))]
    * over D hash buckets of the doc's unigrams AND adjacent word
    * bigrams (the paper's featurization), add-one smoothed. Positive
    * logw = target-like; selection composes downstream (threshold, or
    * [[budgetSelect]]-style top-k over logw).
    *
    * Shape at scale: featurization is one explode (≈ 2·tokens per doc)
    * → groupBy(doc, bucket) with map-side combine; BOTH models are
    * D-bounded aggregates broadcast back to the scoring join; only the
    * two totals T_t, T_r reach the driver. The raw featurization feeds
    * the raw model AND the scoring join inside one plan — Catalyst
    * reuses the exchange rather than re-scanning. Docs with no tokens
    * emit no row. Output: (doc, n_feats, logw rounded to 6 — the
    * engine-portable [[unigramScore]] convention). */
  def dsirWeights(raw: org.apache.spark.sql.DataFrame,
                  target: org.apache.spark.sql.DataFrame,
                  id: String, text: String,
                  dim: Int = 4096): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    def feats(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val t0 = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
        .filter(size(col("__ws")) > 0)
      val uni = t0.select(col("doc"), explode(col("__ws")).as("g"))
      val big = t0.filter(size(col("__ws")) >= 2)
        .select(col("doc"),
          explode(sequence(lit(1), size(col("__ws")) - 1)).as("i"),
          col("__ws"))
        .select(col("doc"),
          concat(element_at(col("__ws"), col("i")), lit(" "),
            element_at(col("__ws"), col("i") + 1)).as("g"))
      uni.unionByName(big)
        .select(col("doc"), pmod(tokenHash(col("g")), lit(dim)).as("b"))
        .groupBy("doc", "b").agg(count(lit(1)).as("tf"))
    }
    val rawTf = feats(raw)
    val ct = feats(target).groupBy("b").agg(sum(col("tf")).as("ct"))
    val cr = rawTf.groupBy("b").agg(sum(col("tf")).as("cr"))
    // The two model totals are the only driver-side scalars. Σ tf over
    // buckets ≡ the corpus feature-instance count ≡ Σ_docs (2n − 1)
    // for n ≥ 1 tokens (n unigrams + n−1 bigrams), so each total
    // comes from a map-only token-count scan — the featurization
    // shuffle never runs for a driver action, only once inside the
    // returned plan (where Catalyst reuses rawTf's exchange between
    // the raw model and the scoring join). Empty corpora total 0 —
    // smoothing keeps every log finite.
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.select(size(tokens(col(text))).as("__n"))
        .filter(col("__n") > 0)
        .agg(coalesce(sum(col("__n") * 2 - 1), lit(0L)).cast(LongType))
        .head().getLong(0)
    val tT = total(target)
    val tR = total(raw)
    val denT = lit((tT + dim).toDouble)
    val denR = lit((tR + dim).toDouble)
    rawTf
      .join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b")) // raw model covers every raw bucket
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_feats"),
        round(sum(col("tf").cast(DoubleType) *
          (log((coalesce(col("ct"), lit(0L)).cast(DoubleType) + lit(1.0))
              / denT) -
            log((col("cr").cast(DoubleType) + lit(1.0)) / denR))), 6)
          .as("logw"))
  }

  /** The [[dsirWeights]] model exported for SERVING: the per-bucket
    * log-ratio map over the UNION of buckets either corpus touched,
    * plus the unseen-bucket default (both counts 0 under the same
    * smoothing). D-bounded — the driver-side Map is the reference
    * object a stream scorer ([[graft.streaming.Events.dsirStream]]) or
    * a later batch folds over without retraining, the
    * `trainLogistic`/`classifyStream` serving convention. Scoring a
    * raw-corpus doc through this model reproduces [[dsirWeights]]'s
    * logw for it exactly (same per-bucket terms). */
  def dsirModel(raw: org.apache.spark.sql.DataFrame,
                target: org.apache.spark.sql.DataFrame,
                id: String, text: String,
                dim: Int = 4096): (Map[Int, Double], Double) = {
    require(dim > 0, s"dim must be positive: $dim")
    def counts(df: org.apache.spark.sql.DataFrame, out: String)
        : org.apache.spark.sql.DataFrame = {
      val t0 = df.select(col(id).as("doc"), tokens(col(text)).as("__ws"))
        .filter(size(col("__ws")) > 0)
      val uni = t0.select(explode(col("__ws")).as("g"))
      val big = t0.filter(size(col("__ws")) >= 2)
        .select(explode(sequence(lit(1), size(col("__ws")) - 1)).as("i"),
          col("__ws"))
        .select(concat(element_at(col("__ws"), col("i")), lit(" "),
          element_at(col("__ws"), col("i") + 1)).as("g"))
      uni.unionByName(big)
        .select(pmod(tokenHash(col("g")), lit(dim)).as("b"))
        .groupBy("b").agg(count(lit(1)).as(out))
    }
    val ct = counts(target, "ct")
    val cr = counts(raw, "cr")
    val tT = ct.agg(coalesce(sum(col("ct")), lit(0L))).head().getLong(0)
    val tR = cr.agg(coalesce(sum(col("cr")), lit(0L))).head().getLong(0)
    val denT = (tT + dim).toDouble
    val denR = (tR + dim).toDouble
    val m = ct.join(cr, Seq("b"), "full_outer")
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)).cast(DoubleType) + lit(1.0))
            / lit(denT)) -
          log((coalesce(col("cr"), lit(0L)).cast(DoubleType) + lit(1.0))
            / lit(denR))).as("lr"))
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    (m, math.log(1.0 / denT) - math.log(1.0 / denR))
  }
}
