package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.Dialect
import graft.llm.TextAnalysis

/** Property tests for the oracle-sensitive algebra: datediff composition
  * laws (SURVEY §5) and rolling-hash stability between the codegen
  * expression and its driver-side replica. Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge artifact is not in
  * the offline dependency set). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val dateGen: Gen[java.sql.Timestamp] = for {
    d <- Gen.choose(0L, 60L * 365 * 24 * 3600) // 1970..2030
    ms <- Gen.choose(0L, 86399000L)
  } yield new java.sql.Timestamp(d * 1000 + ms)

  test("rightStr folds a constant-zero length at construction (no " +
      "trivially-true 0==0 predicate)") {
    // the fold: rightStr(s, lit(0)) must BE the empty-string literal,
    // not a when(0 === 0, ...) tree (r6 verdict: 3 WARN lines per bench
    // tail traced to fn_right's deliberate zero-guard row)
    assert(org.apache.spark.sql.GraftColumnBridge
      .literalValue(Dialect.rightStr($"x", lit(0))).contains(""))
    // dynamic lengths still guard (zero -> '', not the full suffix)
    val out = Seq(("hello", 0), ("hello", 3)).toDF("s", "n")
      .select(Dialect.rightStr($"s", $"n").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("", "llo"))
  }

  test("datediff: antisymmetry and chained-unit composition laws") {
    val pairs = (1 to 200).map(i =>
      (draw(dateGen, i), draw(dateGen, 1000 + i)))
    val df = pairs.toDF("f", "t")
    val checked = df.select(
      (Dialect.dateDiff("day", $"f", $"t") +
        Dialect.dateDiff("day", $"t", $"f")).as("day_sym"),
      (Dialect.dateDiff("quarter", $"f", $"t") -
        (Dialect.dateDiff("year", $"f", $"t") * 4 +
          quarter($"t") - quarter($"f"))).as("q_comp"),
      (Dialect.dateDiff("minute", $"f", $"t") -
        (Dialect.dateDiff("hour", $"f", $"t") * 60 +
          minute($"t") - minute($"f"))).as("m_comp"))
    assert(checked.filter(
      $"day_sym" =!= 0 || $"q_comp" =!= 0 || $"m_comp" =!= 0)
      .count() == 0)
  }

  test("dateadd/datediff roundtrip: adding n units advances the boundary count by n") {
    for (part <- Seq("year", "month", "day", "hour")) {
      val rows = (1 to 100).map(i =>
        (draw(dateGen, part.hashCode + i), draw(Gen.choose(-500, 500), i)))
      val df = rows.toDF("f", "n")
      val bad = df.select(
        Dialect.dateDiff(part, $"f",
          Dialect.dateAdd(part, $"n", $"f")).as("got"), $"n")
        .filter($"got" =!= $"n")
      assert(bad.count() == 0, s"roundtrip broke for part=$part")
    }
  }

  test("as-of join agrees with a brute-force reference on random data") {
    // small random key/ts space forces heavy key collisions and ts ties
    val keyGen = Gen.choose(0, 5)
    val tsGen = Gen.choose(0L, 50L)
    val leftRows = (1 to 120).map(i =>
      (i.toLong, draw(keyGen, i).toString, draw(tsGen, 7000 + i)))
    // right side unique per (key, ts) — the operator's documented contract
    val rightRows = (1 to 150).map(i =>
        (draw(keyGen, 9000 + i).toString, draw(tsGen, 11000 + i)))
      .distinct.zipWithIndex
      .map { case ((k, t), i) => (k, t, i * 1.5) }
    val left = leftRows.toDF("event_id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "rv")
    val got = graft.operators.AsOfJoin
      .asOf(left, right, "k", "ts", Seq("rv"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // brute force: latest right at-or-before, per left row
    val expected = leftRows.map { case (id, k, t) =>
      id -> rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
    assert(got.size == leftRows.size) // exactly one output row per left row
  }

  test("broadcastAsOf agrees with brute force across all directions " +
      "(random data, integral ts)") {
    val keyGen = Gen.choose(0, 5)
    val tsGen = Gen.choose(0L, 50L)
    val leftRows = (1 to 120).map(i =>
      (i.toLong, draw(keyGen, i).toString, draw(tsGen, 7000 + i)))
    val rightRows = (1 to 150).map(i =>
        (draw(keyGen, 9000 + i).toString, draw(tsGen, 11000 + i)))
      .distinct.zipWithIndex
      .map { case ((k, t), i) => (k, t, i * 1.5) }
    val left = leftRows.toDF("event_id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "rv")
    val tol = 7L
    for (dir <- Seq("backward", "forward", "nearest");
         tolOpt <- Seq(None, Some(tol))) {
      val got = graft.operators.AsOfJoin
        .broadcastAsOf(left, right, Seq("k"), "ts", Seq("rv"),
          toleranceUs = tolOpt, direction = dir)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val expected = leftRows.map { case (id, k, t) =>
        val inTol = rightRows.filter(r => r._1 == k &&
          tolOpt.forall(tl => math.abs(r._2 - t) <= tl))
        val back = inTol.filter(_._2 <= t).sortBy(_._2).lastOption
        val fwd = inTol.filter(_._2 >= t).sortBy(_._2).headOption
        id -> (dir match {
          case "backward" => back.map(_._3)
          case "forward" => fwd.map(_._3)
          case _ => (back, fwd) match {
            case (Some(b), Some(f)) =>
              Some(if (t - b._2 <= f._2 - t) b._3 else f._3)
            case (b, f) => b.orElse(f).map(_._3)
          }
        })
      }.toMap
      assert(got == expected, s"direction=$dir tolerance=$tolOpt")
    }
  }

  test("range join agrees with the naive BETWEEN join for arbitrary " +
      "bucket widths (random data incl. negative domains)") {
    val vGen = Gen.choose(-100L, 100L)
    val points = (1 to 150).map(i => (i.toLong, draw(vGen, i)))
      .toDF("id", "p")
    val ivRows = (1 to 60).map { i =>
      val lo = draw(vGen, 5000 + i)
      (i.toLong, lo, lo + draw(Gen.choose(-5L, 40L), 6000 + i))
    }
    val ivs = ivRows.toDF("iv", "lo", "hi")
    val naive = points.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"id", $"iv").as[(Long, Long)].collect().sorted.toSeq
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin
        .pointInInterval(points, "p", ivs, "lo", "hi", width)
        .select($"id", $"iv").as[(Long, Long)].collect().sorted.toSeq
      assert(got === naive, s"bucketWidth=$width")
    }
  }

  test("interval overlap agrees with the naive join, exactly once per " +
      "pair, for arbitrary bucket widths") {
    val vGen = Gen.choose(-100L, 100L)
    def mk(n: Int, seedBase: Int, idCol: String, lo: String, hi: String) = {
      val rows = (1 to n).map { i =>
        val l = draw(vGen, seedBase + i)
        (i.toLong, l, l + draw(Gen.choose(-5L, 40L), seedBase + 700 + i))
      }
      (rows, rows.toDF(idCol, lo, hi))
    }
    val (aRows, a) = mk(50, 20000, "a_id", "a_lo", "a_hi")
    val (bRows, b) = mk(50, 30000, "b_id", "b_lo", "b_hi")
    val naive = (for {
      (ai, alo, ahi) <- aRows if alo <= ahi
      (bi, blo, bhi) <- bRows if blo <= bhi
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).sorted
    for (width <- Seq(1L, 9L, 50L, 1000L)) {
      val got = graft.operators.RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", width)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got === naive, s"bucketWidth=$width")
    }
  }

  test("softWeights invariants on random corpora: weights sum to the " +
      "distinct count, cluster-consistent, exact-dedup-consistent") {
    val textGen = Gen.oneOf("a", "b", "c", "aa", "ab", "", "a b", "b a")
    for (seed <- Seq(11L, 12L, 13L)) {
      val rows = (1 to 120).map(i =>
        (i.toLong, draw(textGen, seed * 1000 + i)))
      val df = rows.toDF("doc_id", "text")
      val out = graft.llm.Dedup.softWeights(df, $"doc_id", $"text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.length == rows.length) // nothing dropped
      val byId = out.map(t => t._1 -> t).toMap
      val byText = rows.groupBy(_._2)
      // n_dups equals the true cluster size; weight = round(1/n, 6)
      for ((text, members) <- byText; (id, _) <- members) {
        val (_, n, w) = byId(id)
        assert(n == members.size)
        // Spark round() is half-up for positives; no 1/n with n <= 120
        // lands on a 6-place halfway point, so this is exact
        assert(w == math.round(1e6 / n) / 1e6)
      }
      // the training invariant: Σ weights == number of distinct texts
      // (up to the 6-place rounding each cluster contributes)
      val total = out.map(_._3).sum
      assert(math.abs(total - byText.size) < 1e-3,
        s"sum ${total} vs distinct ${byText.size}")
      // consistency with exact dedup: same clusters, so exact's
      // (keep_id, n_dups) pairs are exactly the min-id rows here
      val exact = graft.llm.Dedup.exact(df, $"text", $"doc_id")
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(exact == byText.values
        .map(ms => ms.map(_._1).min -> ms.size.toLong).toMap)
    }
  }

  test("heavy hitters equals exact GROUP BY/HAVING on zipf-ish random keys") {
    val keyGen = Gen.frequency(
      (8, Gen.const(0L)), (4, Gen.const(1L)), (2, Gen.const(2L)),
      (8, Gen.choose(3L, 2000L)))
    val rows = (1 to 3000).map(i => Tuple1(draw(keyGen, i)))
    val df = rows.toDF("k").repartition(16)
    val n = rows.size.toDouble
    for (phi <- Seq(0.001, 0.01, 0.05, 0.3)) {
      val got = graft.operators.HeavyHitters.heavyHitters(df, "k", phi)
        .as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._1).view.mapValues(_.size.toLong)
        .filter(_._2 > phi * n).toMap
      assert(got == expected, s"phi=$phi")
    }
  }

  test("packShards invariants: offset bound, dense shards, token conservation") {
    // random corpora with wildly varying doc lengths; the operator got
    // burned by oracle representation drift once (r3 ta_pack) — pin its
    // semantics independently of the oracle
    val wordGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('.', ',', '-'))).map(_.mkString)
    val docGen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    for (seed <- 1 to 3) {
      val budget = Seq(64L, 256L, 2048L)(seed - 1)
      val docs = (1 to 300).map(i =>
        (i.toLong, draw(docGen, seed * 10000L + i)))
      val df = docs.toDF("doc_id", "text")
      val packed = graft.llm.TextAnalysis
        .packShards(df, "doc_id", "text", budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // 1. every offset sits inside the shard's token budget
      assert(packed.forall(_._4 < budget), s"offset >= budget=$budget")
      assert(packed.forall(_._4 >= 0))
      // 2. local shard ids are dense (0..max, no gaps) within each group —
      // guaranteed when no single doc exceeds the budget (each doc then
      // advances the running total by at most one shard); an overlong doc
      // legitimately skips shards (block-packing approximation)
      if (packed.map(_._2).max <= budget) {
        packed.groupBy(_._3 >> 32).foreach { case (grp, rows) =>
          val locals = rows.map(r => r._3 & 0xffffffffL).distinct.sorted
          assert(locals.sameElements(0L until locals.length.toLong),
            s"group $grp shard ids not dense: ${locals.mkString(",")}")
        }
      }
      // 3. token conservation: every input doc appears exactly once with
      // its own token count — nothing dropped, duplicated, or resized
      assert(packed.length == docs.length)
      assert(packed.map(_._1).distinct.length == docs.length)
      val expectedTokens = df.select(sum(
        graft.llm.TextAnalysis.tokenCountBpe($"text").cast("long")))
        .head.getLong(0)
      assert(packed.map(_._2).sum == expectedTokens)
      // and the greedy rule itself: positions follow the exclusive
      // cumulative sum exactly — shard/offset are div/mod of the running
      // total, so each doc's position derives from its predecessor's
      // (an overlong doc rolls the remainder into the next shard)
      packed.groupBy(_._3 >> 32).foreach { case (_, rows) =>
        rows.sortBy(_._1).foldLeft(0L) { case (cum, (_, n, shard, off)) =>
          assert(off == cum % budget)
          assert((shard & 0xffffffffL) == cum / budget)
          cum + n
        }
      }
    }
  }

  test("DotProduct codegen COMPILES for non-nullable inputs (no silent fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // r4 regression: with nullable=false the generated null-check wrote
    // `false = true;`, janino refused it, and Spark silently fell back to
    // interpreted eval. GenerateUnsafeProjection compiles EAGERLY (no
    // fallback), so a codegen bug fails this test instead of hiding.
    val t = ArrayType(DoubleType, containsNull = false)
    val e = graft.functions.DotProduct(
      BoundReference(0, t, nullable = false),
      BoundReference(1, t, nullable = false))
    assert(!e.nullable)
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val arr = new GenericArrayData(Array(1.0, 2.0, 3.0))
    val row = proj(InternalRow(arr, arr))
    assert(row.getDouble(0) == 14.0)
    // and the nullable variant still null-propagates element nulls
    val tn = ArrayType(DoubleType, containsNull = true)
    val en = graft.functions.DotProduct(
      BoundReference(0, tn, nullable = false),
      BoundReference(1, tn, nullable = false))
    assert(en.nullable)
    val projN = GenerateUnsafeProjection.generate(Seq(en))
    val withNull = new GenericArrayData(Array[Any](1.0, null, 3.0))
    assert(projN(InternalRow(withNull, withNull)).isNullAt(0))
    assert(projN(InternalRow(arr, arr)).getDouble(0) == 14.0)
  }

  test("zValue: invertible interleave, rectangle-range monotonicity") {
    import graft.sources.Layout
    val pairGen = for {
      x <- Gen.choose(0L, 255L)
      y <- Gen.choose(0L, 255L)
    } yield (x, y)
    val pts = (1 to 300).map(i => draw(pairGen, i.toLong))
    val zs = pts.toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // invertibility: de-interleaving the bits recovers (x, y) exactly —
    // no information loss, so sorting by z is a total spatial order
    def unz(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L; var i = 0
      while (i < 8) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    assert(zs.map(unz) == pts)
    // locality property behind the file skipping: any z-CONTIGUOUS run
    // is bounded in both coordinates by the run's own min/max corner
    // quadrants — here verified in the small: points sharing their
    // top 2×2 quadrant bits form one contiguous z block
    val byQuad = pts.zip(zs).groupBy { case ((x, y), _) =>
      (x >> 6, y >> 6) }
    for ((_, members) <- byQuad) {
      val qzs = members.map(_._2)
      val others = zs.toSet -- qzs.toSet
      // no foreign point interleaves into the quadrant's z-range
      assert(others.forall(z => z < qzs.min || z > qzs.max))
    }
  }

  test("RollingHash agrees with the driver-side replica on arbitrary BMP strings") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '|', 'é', '中', 'д')))
      .map(_.mkString)
    val ss = (1 to 300).map(i => draw(strGen, i.toLong))
    val expected = ss.map(TextAnalysis.rollLocal)
    val got = ss.toDF("s")
      .select(graft.functions.RollingHash($"s").as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("BottomK aggregate: parity with sort-take at every partitioning (property)") {
    // random multisets with heavy duplication so the k-th boundary ties;
    // the multiset of k smallest is order-unique, so every partition
    // count must merge to the same answer
    val vals = (1 to 500).map(i => draw(Gen.choose(0L, 40L), i.toLong * 13))
    val keys = (1 to 500).map(i => draw(Gen.oneOf("a", "b", "c"), i.toLong * 7))
    val df = keys.zip(vals).toDF("k", "v")
    val expected = keys.zip(vals).groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted.take(5)
    }
    for (parts <- Seq(1, 3, 32)) {
      val got = df.repartition(parts)
        .groupBy($"k")
        .agg(graft.functions.BottomK.bottomK($"v", 5).as("b"))
        .as[(String, Seq[Long])].collect().toMap
      assert(got.view.mapValues(_.toSeq).toMap ===
        expected.view.mapValues(_.toSeq).toMap, s"at $parts partitions")
    }
  }

  test("BottomK: k > group size returns the whole sorted group; nulls skipped") {
    val df = Seq(("a", Some(3L)), ("a", None), ("a", Some(1L)))
      .toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(graft.functions.BottomK.bottomK($"v", 10).as("b"))
      .as[(String, Seq[Long])].head()
    assert(got === (("a", Seq(1L, 3L))))
  }

  test("BottomK plans as ObjectHashAggregate with a partial stage") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    val plan = df.groupBy($"k")
      .agg(graft.functions.BottomK.bottomK($"v", 3).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_graft_bottom_k"),
      "map-side partial aggregation must run before the exchange")
  }

  test("tfidfPairs prefix arm equals brute force on random clique-heavy " +
      "corpora (merge-kernel property)") {
    // Random corpora from a TINY vocab: heavy rank ties, duplicate
    // documents (clique collapse paths), empty docs, and single-token
    // docs — the edge structure the PrefixMergeDot ordinal dedup and
    // hashed join keys must survive. Brute force is the definitional
    // tok-equijoin + groupBy dot; the prefix arm is forced
    // (denseVocabMax = 0) so the merge kernel is what's under test.
    val vocab = Vector("aa", "b", "ccc", "dd", "e", "fff", "g", "hh")
    for (seed <- 1 to 3; t <- Seq(0.55, 0.9)) {
      val rnd = new scala.util.Random(seed * 7919 + (t * 100).toInt)
      val docs = (0 until 50).map { i =>
        val len = rnd.nextInt(7) // 0..6 tokens, empties included
        (i.toLong,
          (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
      } ++ Seq(50L -> "aa b ccc", 51L -> "aa b ccc", 52L -> "aa b ccc")
      val df = docs.toDF("doc_id", "text")
      val n = df.count()
      val toks = df.select($"doc_id".as("doc"),
        explode(TextAnalysis.tokens(lower($"text"))).as("tok"))
      val tf = toks.groupBy("doc", "tok").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("tok").agg(count(lit(1)).as("dfd"))
      val w = tf.join(dfc, Seq("tok")).select($"doc", $"tok",
        ($"tf" * (lit(1L) +
          floor(log2(expr(s"CAST($n AS BIGINT) div dfd"))).cast("long")))
          .as("w"))
      val n2 = w.groupBy("doc").agg(sum($"w" * $"w").as("n2"))
      val brute = w.alias("a").join(w.alias("b"),
          col("a.tok") === col("b.tok") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .agg(sum(col("a.w") * col("b.w")).as("dot"))
        .join(n2.select($"doc".as("doc_a"), $"n2".as("n2_a")), Seq("doc_a"))
        .join(n2.select($"doc".as("doc_b"), $"n2".as("n2_b")), Seq("doc_b"))
        .filter($"dot".cast("double") >=
          lit(t) * sqrt($"n2_a".cast("double") * $"n2_b".cast("double")))
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val got = graft.llm.Dedup.tfidfPairs(df, "doc_id", "text", t,
          denseVocabMax = 0L)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"seed=$seed t=$t " +
        s"missing=${brute -- got} extra=${got -- brute}")
      assert(got.nonEmpty, s"seed=$seed t=$t produced no pairs")
    }
  }
}
