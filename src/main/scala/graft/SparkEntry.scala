package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Dialect
import graft.mat.{Incremental, Snapshot}

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

    // ---- pass-through relational breadth (SURVEY §2.5): windows, rollup,
    // set ops, semi/anti joins, top-k, correlated subquery ----
    "q03_window" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(
        col("o_orderdate"), col("o_orderkey"))
      o.select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
            .as("running_total"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q04_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q05_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val both = big.intersect(urgent).withColumn("src", lit("both"))
      val bigOnly = big.except(urgent).withColumn("src", lit("big_only"))
      both.unionByName(bigOnly).orderBy(col("src"), col("o_custkey"))
    }),

    "q06_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_semi").select(col("c_custkey")).withColumn("has_orders", lit(true))
      val noOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_anti").select(col("c_custkey")).withColumn("has_orders", lit(false))
      withOrders.unionByName(noOrders).orderBy(col("c_custkey"))
    }),

    "q07_topk" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DecimalType(28, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10)
        .select(col("o_custkey"), col("revenue").cast(DoubleType).as("revenue"))
    }),

    "q08_corr_subquery" -> ((s, dir) => {
      // orders above their customer's average price — correlated scalar
      // subquery shape, expressed as a join on a pre-agg (what Catalyst's
      // decorrelation would produce anyway)
      // "price > avg(price)" compared exactly as price * n > sum(price)
      // (pure decimal arithmetic — no float/decimal division divergence
      // between engines)
      val o = t(s, dir, "orders")
      val aggByCust = o.groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("sum_price"),
          count(lit(1)).as("n_orders"))
      o.join(aggByCust, Seq("o_custkey"))
        .filter(dec(col("o_totalprice")) * col("n_orders") > col("sum_price"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("o_custkey"))
    }),

    // ---- incremental strategies as oracle-checked rewrites (SURVEY §2.2) ----
    "inc_append" -> ((s, dir) => {
      val (target, staged) = incFixture(s, dir)
      Incremental.append(target, staged).orderBy(col("o_orderkey"), col("src"))
    }),

    "inc_delete_insert" -> ((s, dir) => {
      val (target, staged) = incFixture(s, dir)
      Incremental.deleteInsert(target, staged, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"), col("src"))
    }),

    "inc_merge" -> ((s, dir) => {
      val (target, staged) = incFixture(s, dir)
      Incremental.merge(target, staged, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"), col("src"))
    }),

    "inc_merge_subset" -> ((s, dir) => {
      // merge_update_columns = [src]: price keeps the TARGET value on match
      val (target, staged) = incFixture(s, dir)
      Incremental.merge(target, staged, Seq("o_orderkey"),
          updateColumns = Seq("src"))
        .orderBy(col("o_orderkey"), col("src"))
    }),

    "snapshot_scd2" -> ((s, dir) => {
      // deterministic two-step SCD2 cycle over orders:
      //   v0 = keys %10 in 0..4 (updated_at = o_orderdate)
      //   v1 = all keys; keys %10 in (0,1) changed (status='XX', +10 days)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("v"),
        col("o_orderdate").cast(TimestampType).as("updated_at"))
      val v0 = o.filter(pmod(col("id"), lit(10)) < 5)
      val changed = pmod(col("id"), lit(10)) < 2
      val v1 = o.select(col("id"),
        when(changed, lit("XX")).otherwise(col("v")).as("v"),
        when(changed, col("updated_at") + expr("interval 10 days"))
          .otherwise(col("updated_at")).as("updated_at"))
      val snap0 = Snapshot.initial(v0, Seq("id"), "updated_at")
      Snapshot.run(snap0, v1, Seq("id"), "updated_at")
        .select(col("id"), col("v"), col("dbt_valid_from"), col("dbt_valid_to"))
        .orderBy(col("id"), col("dbt_valid_from"))
    }),
  )

  /** Shared deterministic fixture for the incremental-strategy queries:
    * target = orders with key%4 != 0, staged = key%2 == 0 with doubled
    * price and src='staged'. */
  private def incFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey"),
      dec(col("o_totalprice")).cast(DoubleType).as("price"),
      lit("target").as("src"))
    val target = o.filter(pmod(col("o_orderkey"), lit(4)) =!= 0)
    val staged = t(s, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
        (dec(col("o_totalprice")) * 2).cast(DoubleType).as("price"),
        lit("staged").as("src"))
    (target, staged)
  }

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

    "q03_window" ->
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
        |  lag(o_orderkey, 1) OVER w AS prev_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q04_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  count(*) AS n
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q05_setops" ->
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
        |     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_custkey, 'both' AS src
        |FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
        |UNION ALL
        |SELECT o_custkey, 'big_only' AS src
        |FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
        |ORDER BY src, o_custkey""".stripMargin,

    "q06_semi_anti" ->
      """SELECT c_custkey,
        |  c_custkey IN (SELECT o_custkey FROM orders) AS has_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q07_topk" ->
      """SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue
        |FROM (SELECT o_custkey,
        |        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS revenue
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      GROUP BY o_custkey)
        |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin,

    "q08_corr_subquery" ->
      """SELECT o_custkey, count(*) AS n_above
        |FROM orders o
        |JOIN (SELECT o_custkey,
        |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price,
        |        count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) a USING (o_custkey)
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * a.n_orders > a.sum_price
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "inc_append" ->
      s"""$incFixtureSql
        |SELECT * FROM target UNION ALL SELECT * FROM staged
        |ORDER BY o_orderkey, src""".stripMargin,

    "inc_delete_insert" ->
      s"""$incFixtureSql
        |SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
        |UNION ALL SELECT * FROM staged
        |ORDER BY o_orderkey, src""".stripMargin,

    "inc_merge" ->
      s"""$incFixtureSql
        |SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.src ELSE t.src END AS src
        |FROM target t FULL OUTER JOIN staged s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey, src""".stripMargin,

    "inc_merge_subset" ->
      s"""$incFixtureSql
        |SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
        |  CASE WHEN t.o_orderkey IS NOT NULL THEN t.price ELSE s.price END AS price,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.src ELSE t.src END AS src
        |FROM target t FULL OUTER JOIN staged s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey, src""".stripMargin,

    "snapshot_scd2" ->
      """WITH o AS (SELECT o_orderkey AS id, o_orderstatus AS v,
        |                  CAST(o_orderdate AS TIMESTAMP) AS ua FROM orders)
        |SELECT id, v, ua AS dbt_valid_from, CAST(NULL AS TIMESTAMP) AS dbt_valid_to
        |FROM o WHERE id % 10 BETWEEN 2 AND 4
        |UNION ALL
        |SELECT id, v, ua, ua + INTERVAL 10 DAY FROM o WHERE id % 10 < 2
        |UNION ALL
        |SELECT id, 'XX', ua + INTERVAL 10 DAY, CAST(NULL AS TIMESTAMP)
        |FROM o WHERE id % 10 < 2
        |UNION ALL
        |SELECT id, v, ua, CAST(NULL AS TIMESTAMP) FROM o WHERE id % 10 >= 5
        |ORDER BY id, dbt_valid_from""".stripMargin,
  )

  /** DuckDB twin of [[incFixture]]. */
  private val incFixtureSql =
    """WITH target AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |    'target' AS src
      |  FROM orders WHERE o_orderkey % 4 != 0),
      |staged AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS price,
      |    'staged' AS src
      |  FROM orders WHERE o_orderkey % 2 = 0)""".stripMargin
}
