package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference adapter's cross-dialect SQL function surface
  * (`dbt/include/extrica/macros/utils/` — 16 macro files — plus `impl.py`
  * helpers),
  * re-expressed as native Spark `Column` compositions.
  *
  * Everything here stays inside whole-stage codegen: plain
  * `org.apache.spark.sql.functions` trees, no UDFs, no driver-side work —
  * each function is a `Column => Column` rewrite that Catalyst folds into
  * the surrounding plan, so pushdown/pruning still apply at 100 TB.
  */
object Dialect {

  /** any_value(e) → min(e): the reference deliberately renders dbt's
    * any_value as the deterministic `min` (utils/any_value.sql:1-3).
    * Kept as `min` for oracle parity. */
  def anyValue(e: Column): Column = min(e)

  /** utils/bool_or.sql:1-3 — passthrough; Spark has a native bool_or. */
  def boolOr(e: Column): Column = bool_or(e)

  /** utils/array_construct.sql:1-7 — `array[a, b, …]`; empty input renders
    * a typed NULL (the reference emits `null`). */
  def arrayConstruct(inputs: Seq[Column], elemType: DataType = StringType): Column =
    if (inputs.isEmpty) lit(null).cast(ArrayType(elemType)) else array(inputs: _*)

  /** utils/array_concat.sql:1-3 — `concat(a1, a2)`. */
  def arrayConcat(a1: Column, a2: Column): Column = concat(a1, a2)

  /** utils/array_append.sql:1-3 — composed exactly like the reference:
    * `concat(a, array[e])`. */
  def arrayAppend(a: Column, e: Column): Column = concat(a, array(e))

  /** utils/listagg.sql:1-7 —
    * `array_join(slice(array_agg(measure [order by k]), 1, limit), delim)`.
    *
    * Spark's collect_list is unordered, so the ordered variant collects
    * (orderKey, measure) structs, array_sorts (lexicographic on the struct:
    * orderKey first, measure as deterministic tie-break), then projects the
    * measure back out. All codegen-friendly; the aggregation is a normal
    * partial/final hash agg — no extra shuffle beyond the groupBy.
    */
  def listagg(measure: Column, delimiter: String,
              orderBy: Option[Column] = None,
              limit: Option[Int] = None): Column = {
    val arr = orderBy match {
      case Some(k) =>
        transform(array_sort(collect_list(struct(k.as("k"), measure.as("v")))),
          x => x.getField("v"))
      case None => collect_list(measure)
    }
    val limited = limit.map(n => slice(arr, 1, n)).getOrElse(arr)
    array_join(limited, delimiter)
  }

  /** utils/dateadd.sql:1-3 — Trino 3-arg `date_add('part', n, d)`.
    * Spark equivalent is `timestampadd` (NOT Spark's 2-arg days-only
    * date_add). */
  def dateAdd(part: String, n: Column, d: Column): Column =
    timestamp_add(part.toUpperCase, n, d.cast(TimestampType))
  def dateAdd(part: String, n: Int, d: Column): Column = dateAdd(part, lit(n), d)

  /** utils/datediff.sql:1-28 — Trino/dbt boundary-crossing datediff,
    * replicated part-for-part (NOT Spark's days-only datediff and NOT
    * months_between):
    *   year    = year(t) - year(f)
    *   quarter = yearDiff*4 + quarter delta
    *   month   = yearDiff*12 + month delta
    *   day     = whole-day date subtraction
    *   week    = day/7 (int div toward zero) + dow()-based correction
    *   hour/minute/second = chained from day
    *   millisecond = exact ms delta
    * Trino's dow() is ISO (Mon=1..Sun=7) = Spark weekday()+1.
    */
  def dateDiff(part: String, from: Column, to: Column): Column = {
    val f = from.cast(TimestampType)
    val t = to.cast(TimestampType)
    part.toLowerCase match {
      case "year" => year(t) - year(f)
      case "quarter" =>
        dateDiff("year", from, to) * lit(4) + quarter(t) - quarter(f)
      case "month" =>
        dateDiff("year", from, to) * lit(12) + month(t) - month(f)
      case "day" => datediff(t.cast(DateType), f.cast(DateType))
      case "week" =>
        val dayD = dateDiff("day", from, to)
        val dowF = weekday(f) + lit(1)
        val dowT = weekday(t) + lit(1)
        val corr = when(dowF <= dowT, when(f <= t, lit(0)).otherwise(lit(-1)))
          .otherwise(when(f <= t, lit(1)).otherwise(lit(0)))
        // Trino `/` on integers truncates toward zero; double-div + int cast
        // matches that for the full int range.
        (dayD.cast(DoubleType) / lit(7.0)).cast(IntegerType) + corr
      case "hour" =>
        dateDiff("day", from, to) * lit(24) + hour(t) - hour(f)
      case "minute" =>
        dateDiff("hour", from, to) * lit(60) + minute(t) - minute(f)
      case "second" =>
        dateDiff("minute", from, to) * lit(60) + second(t) - second(f)
      case "millisecond" => unix_millis(t) - unix_millis(f)
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported datepart for datediff: $other")
    }
  }

  /** utils/date_trunc.sql:1-3 — passthrough (Spark returns timestamp,
    * same as Trino for timestamp input). */
  def dateTrunc(part: String, d: Column): Column = date_trunc(part, d)

  /** utils/date_spine.sql:1-46 — the reference builds a generate_series →
    * row_number → dateadd → filter CTE chain; in Spark one expression
    * replaces it: sequence(start, end, 1 part) exploded, end-exclusive
    * (dbt spine semantics: i in [0, datediff(part,start,end))).
    * Fully parallel: explode of a sequence literal is a LocalTableScan →
    * repartition-able generator, no driver loop. */
  def dateSpine(spark: SparkSession, part: String,
                startDate: String, endDate: String): DataFrame = {
    val col = s"date_$part"
    spark.sql(
      s"""SELECT d AS $col FROM (
         |  SELECT explode(sequence(
         |    cast('$startDate' as timestamp),
         |    cast('$endDate' as timestamp),
         |    interval 1 $part)) AS d
         |) WHERE d < cast('$endDate' as timestamp)""".stripMargin)
  }

  /** utils/split_part.sql:1-7 — n>=0 → plain split_part; n<0 → dbt's
    * negative-index variant. Spark's split_part natively supports negative
    * indexes with the same count-from-end semantics. */
  def splitPart(s: Column, delim: String, n: Int): Column =
    split_part(s, lit(delim), lit(n))

  /** utils/right.sql:1-7 — zero-length guard + substr(s, -len). A
    * constant-zero `len` folds to '' at construction: building
    * `lit(0) === lit(0)` would be a (deliberate but noisy) trivially
    * true predicate — Catalyst folds it anyway, this just skips the
    * per-construction WARN. */
  def rightStr(s: Column, len: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.literalValue(len) match {
      case Some(v) if v == 0 => lit("")
      case _ =>
        when(len === lit(0), lit("")).otherwise(substr(s, lit(-1) * len))
    }

  /** utils/hash.sql:1-3 — `lower(to_hex(md5(to_utf8(cast(f as varchar)))))`.
    * Spark's md5 over a string already yields lowercase hex of UTF-8 bytes. */
  def hashMd5(field: Column): Column = md5(field.cast(StringType))

  /** utils/safe_cast.sql:1-3 — try_cast(f as t). Built via SQL fragment
    * because TRY_CAST is parser syntax, not a registered function. */
  def safeCast(sqlExpr: String, sqlType: String): Column =
    expr(s"try_cast(($sqlExpr) as $sqlType)")

  /** utils/timestamps.sql:1-3. */
  def currentTimestampCol(): Column = current_timestamp()

  /** impl.py:47-49 — `date_function()` → `datenow()`: the adapter's
    * current-date macro. */
  def dateNow(): Column = current_date()

  /** utils/timestamps.sql:5-8 — `timestamp '<s>'` literal. */
  def snapshotStringAsTime(ts: String): Column = lit(ts).cast(TimestampType)

  /** impl.py:68-69 — `{col} + interval '{n}' {unit}`. */
  def timestampAddInterval(c: Column, n: Int, unit: String): Column =
    c + expr(s"interval $n $unit")

  /** snapshot.sql:1-6 — SCD2 row-identity hash:
    * md5 hex over '|'-joined coalesce(cast(arg as varchar), '').
    * concat_ws would skip NULLs silently, so coalesce first — this keeps
    * the reference's exact empty-string-for-null behavior. */
  def snapshotHash(args: Seq[Column]): Column =
    md5(concat_ws("|", args.map(a => coalesce(a.cast(StringType), lit(""))): _*))

  /** utils/datatypes.sql:1-15 — dbt generic type macros. */
  val typeFloat: DataType = DoubleType
  val typeString: DataType = StringType
  val typeNumeric: DataType = DecimalType(28, 6)
  val typeInt: DataType = IntegerType
}
