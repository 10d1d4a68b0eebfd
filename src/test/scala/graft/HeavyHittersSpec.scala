package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** The sketch may only PRUNE, never decide: heavyHitters must equal the
  * exact GROUP BY / HAVING on every input and φ. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame, key: String,
                    phi: Double) = {
    val n = df.count()
    df.filter(col(key).isNotNull).groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(n.toDouble))
  }

  test("equals exact GROUP BY/HAVING on events across phi values") {
    val ev = Tables.load(spark, sf, "events")
    for (phi <- Seq(0.002, 0.0075, 0.02, 0.2)) {
      val got = HeavyHitters.heavyHitters(ev, "user_id", phi)
      val want = exact(ev, "user_id", phi)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"phi=$phi")
    }
  }

  test("skewed input across many partitions: guaranteed superset holds") {
    // one key owns 5% of rows; the rest are near-unique — the shape the
    // operator exists for. 64 partitions force the pigeonhole argument
    // to do real work (the hot key must surface from SOME partition).
    val n = 20000
    val df = spark.range(n).repartition(64)
      .select(when(pmod($"id", lit(20)) === 0, lit(-1L))
        .otherwise($"id").as("k"))
    val phi = 0.04
    val got = HeavyHitters.heavyHitters(df, "k", phi)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((-1L, n / 20L)))
  }

  test("string keys and null keys") {
    val df = Seq("a", "a", "a", "b", null, null, "c")
      .toDF("s").repartition(3)
    val got = HeavyHitters.heavyHitters(df, "s", 0.3)
      .as[(String, Long)].collect().toSet
    // nulls are ignored by contract (not counted, never emitted)
    assert(got === Set(("a", 3L)))
  }
}
