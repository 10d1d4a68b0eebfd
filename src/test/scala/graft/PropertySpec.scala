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
