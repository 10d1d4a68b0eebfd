package graft

import org.apache.spark.sql.types._

/** Pins the post-load Spark schema of every driver table.
  *
  * The driver has regenerated the testdata between rounds with different
  * physical timestamp encodings (nanos, tz-micros, NTZ-micros); `Tables.load`
  * is the single normalization point, and this spec makes an environment
  * change fail ONE obvious test instead of fifteen confusing ones downstream
  * (round-7 lesson: the NTZ regeneration broke 15 tests and 3 driver rows
  * before anything named the loader).
  */
class TablesSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (name <- Tables.names) {
    test(s"$name loads with the pinned Spark schema") {
      val got = Tables.load(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      assert(got === expected(name),
        s"loader contract drift for '$name' — the driver likely " +
          "regenerated the parquet with a new physical encoding; " +
          "normalize it in Tables.load, not at call sites")
    }
  }

  test("no timestamp column survives load as TIMESTAMP_NTZ") {
    for (name <- Tables.names) {
      val ntz = Tables.load(spark, sf, name).schema.fields
        .filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"$name: NTZ columns leaked through load: " +
        ntz.mkString(","))
    }
  }
}
