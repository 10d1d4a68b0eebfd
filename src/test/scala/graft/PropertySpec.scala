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
}
