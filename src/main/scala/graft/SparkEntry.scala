package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dialect

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has an `oracleSql` twin in DuckDB dialect over
  * the same parquet tables; aggregates over double columns are routed
  * through exact decimal arithmetic on BOTH sides (then cast to double)
  * so the hash-compare is not at the mercy of float summation order.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** double → exact decimal for order-independent aggregation. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary: scan → filter → agg → sort, the
    * vertical slice through every layer (SURVEY §7.2 slice 0). */
  def entry(spark: SparkSession): DataFrame =
    pricingSummary(spark, "/root/testdata/sf0.001")

  private def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- pass-through relational surface (SURVEY §2.5), native Spark ----
    "q01_pricing_summary" -> ((s, dir) => pricingSummary(s, dir)),

    "q02_top_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- dialect function surface (SURVEY §2.4) ----
    "fn_any_value" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(Dialect.anyValue(col("c_name")).as("any_name"))
        .orderBy(col("c_mktsegment"))),

    "fn_bool_or" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(Dialect.boolOr(col("o_totalprice") > lit(300000)).as("any_big"))
        .orderBy(col("o_orderstatus"))),

    "fn_array_ops" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val constructed = Dialect.arrayConstruct(
        Seq(col("n_name"), col("n_nationkey").cast(StringType)))
      val appended = Dialect.arrayAppend(constructed, lit("tail"))
      val concatenated = Dialect.arrayConcat(appended, Dialect.arrayConstruct(Seq(lit("x"), lit("y"))))
      n.select(
          col("n_nationkey"),
          array_join(constructed, ",").as("arr_construct"),
          array_join(appended, ",").as("arr_append"),
          array_join(concatenated, ",").as("arr_concat"))
        .orderBy(col("n_nationkey"))
    }),

    "fn_listagg" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          Dialect.listagg(col("n_name"), ",", Some(col("n_name"))).as("names_all"),
          Dialect.listagg(col("n_name"), "|", Some(col("n_name")), Some(3)).as("names_top3"))
        .orderBy(col("n_regionkey"))),

    "fn_dateadd" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.dateAdd("month", 3, col("o_orderdate")).as("plus_3mo"),
          Dialect.dateAdd("day", 7, col("o_orderdate")).as("plus_7d"),
          Dialect.dateAdd("hour", 5, col("o_orderdate")).as("plus_5h"),
          Dialect.dateAdd("year", 1, col("o_orderdate")).as("plus_1y"))
        .orderBy(col("o_orderkey"))),

    "fn_datediff" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val f = col("o_orderdate"); val g = col("l_shipdate")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Dialect.dateDiff("year", f, g).as("dd_year"),
          Dialect.dateDiff("quarter", f, g).as("dd_quarter"),
          Dialect.dateDiff("month", f, g).as("dd_month"),
          Dialect.dateDiff("day", f, g).as("dd_day"),
          Dialect.dateDiff("week", f, g).as("dd_week"),
          Dialect.dateDiff("hour", f, g).as("dd_hour"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "fn_date_trunc" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.dateTrunc("month", col("o_orderdate")).as("tr_month"),
          Dialect.dateTrunc("quarter", col("o_orderdate")).as("tr_quarter"),
          Dialect.dateTrunc("week", col("o_orderdate")).as("tr_week"),
          Dialect.dateTrunc("year", col("o_orderdate")).as("tr_year"))
        .orderBy(col("o_orderkey"))),

    "fn_date_spine" -> ((s, dir) =>
      Dialect.dateSpine(s, "day", "1995-01-01", "1995-03-01")
        .select(col("date_day").cast(DateType).as("date_day"))
        .orderBy(col("date_day"))),

    "fn_split_part" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.splitPart(col("o_orderpriority"), "-", 1).as("part_1"),
          Dialect.splitPart(col("o_orderpriority"), "-", 2).as("part_2"),
          Dialect.splitPart(col("o_orderpriority"), "-", -1).as("part_neg1"))
        .orderBy(col("o_orderkey"))),

    "fn_right" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          Dialect.rightStr(col("p_name"), pmod(col("p_size"), lit(4))).as("right_var"),
          Dialect.rightStr(col("p_name"), lit(0)).as("right_zero"))
        .orderBy(col("p_partkey"))),

    "fn_hash" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), Dialect.hashMd5(col("c_name")).as("h"))
        .orderBy(col("c_custkey"))),

    "fn_snapshot_hash" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.snapshotHash(Seq(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"))).as("scd_id"))
        .orderBy(col("o_orderkey"))),

    "fn_safe_cast" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.safeCast("o_orderpriority", "int").as("bad_cast"),
          Dialect.safeCast("split_part(o_orderpriority, '-', 1)", "int").as("good_cast"))
        .orderBy(col("o_orderkey"))),

    "fn_timestamp_add" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Dialect.timestampAddInterval(col("o_orderdate"), 45, "minute").as("plus_45min"))
        .orderBy(col("o_orderkey"))),

    "fn_current_timestamp" -> ((s, dir) =>
      s.range(1).select(Dialect.currentTimestampCol().isNotNull.as("ok"))),
  )

  /** DuckDB-dialect twins for the driver's oracle (sf0.01). Column names
    * match the Spark side exactly (the driver sorts columns by name before
    * hashing). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "fn_any_value" ->
      """SELECT c_mktsegment, min(c_name) AS any_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "fn_bool_or" ->
      """SELECT o_orderstatus, bool_or(o_totalprice > 300000) AS any_big
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_array_ops" ->
      """SELECT n_nationkey,
        |  array_to_string([n_name, CAST(n_nationkey AS VARCHAR)], ',') AS arr_construct,
        |  array_to_string([n_name, CAST(n_nationkey AS VARCHAR), 'tail'], ',') AS arr_append,
        |  array_to_string([n_name, CAST(n_nationkey AS VARCHAR), 'tail', 'x', 'y'], ',') AS arr_concat
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "fn_listagg" ->
      """SELECT n_regionkey,
        |  array_to_string(list(n_name ORDER BY n_name), ',') AS names_all,
        |  array_to_string(list_slice(list(n_name ORDER BY n_name), 1, 3), '|') AS names_top3
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "fn_dateadd" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
        |  o_orderdate + INTERVAL 7 DAY AS plus_7d,
        |  o_orderdate + INTERVAL 5 HOUR AS plus_5h,
        |  o_orderdate + INTERVAL 1 YEAR AS plus_1y
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_datediff" ->
      """SELECT l_orderkey, l_linenumber,
        |  (year(l_shipdate) - year(o_orderdate)) AS dd_year,
        |  (year(l_shipdate) - year(o_orderdate))*4 + quarter(l_shipdate) - quarter(o_orderdate) AS dd_quarter,
        |  (year(l_shipdate) - year(o_orderdate))*12 + month(l_shipdate) - month(o_orderdate) AS dd_month,
        |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS dd_day,
        |  CAST(trunc(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 7.0) AS INT)
        |    + CASE WHEN isodow(o_orderdate) <= isodow(l_shipdate)
        |           THEN CASE WHEN o_orderdate <= l_shipdate THEN 0 ELSE -1 END
        |           ELSE CASE WHEN o_orderdate <= l_shipdate THEN 1 ELSE 0 END END AS dd_week,
        |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))*24
        |    + hour(l_shipdate) - hour(o_orderdate) AS dd_hour
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_date_trunc" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS tr_month,
        |  date_trunc('quarter', o_orderdate) AS tr_quarter,
        |  date_trunc('week', o_orderdate) AS tr_week,
        |  date_trunc('year', o_orderdate) AS tr_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_date_spine" ->
      """SELECT CAST(g AS DATE) AS date_day
        |FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-03-01', INTERVAL 1 DAY) t(g)
        |WHERE g < TIMESTAMP '1995-03-01' ORDER BY date_day""".stripMargin,

    "fn_split_part" ->
      """SELECT o_orderkey,
        |  split_part(o_orderpriority, '-', 1) AS part_1,
        |  split_part(o_orderpriority, '-', 2) AS part_2,
        |  list_extract(string_split(o_orderpriority, '-'), len(string_split(o_orderpriority, '-'))) AS part_neg1
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_right" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size % 4 = 0 THEN '' ELSE right(p_name, p_size % 4) END AS right_var,
        |  '' AS right_zero
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_hash" ->
      """SELECT c_custkey, md5(CAST(c_name AS VARCHAR)) AS h
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_snapshot_hash" ->
      """SELECT o_orderkey,
        |  md5(coalesce(CAST(o_orderkey AS VARCHAR), '') || '|' ||
        |      coalesce(o_orderstatus, '') || '|' ||
        |      coalesce(o_orderpriority, '')) AS scd_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_safe_cast" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_cast,
        |  TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS good_cast
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_timestamp_add" ->
      """SELECT o_orderkey, o_orderdate + INTERVAL 45 MINUTE AS plus_45min
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_current_timestamp" ->
      "SELECT current_timestamp IS NOT NULL AS ok",
  )
}
