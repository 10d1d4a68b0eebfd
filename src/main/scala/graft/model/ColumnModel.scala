package graft.model

import org.apache.spark.sql.types._

/** The reference's column/type model (`column.py:13-109`) bridged to Spark
  * `DataType`s.
  *
  * The reference parses Trino type strings like `varchar(10)` /
  * `decimal(28,6)` / `array(varchar)` (column.py:62-109 from_description),
  * normalizes dbt generic labels STRING→VARCHAR, FLOAT→DOUBLE
  * (column.py:15-18), and treats unbounded varchar as max-size
  * (column.py:10,24-27). Here the declared Trino type string is preserved
  * alongside the Spark DataType so DESCRIBE-style round-trips keep
  * the declared form even where Spark collapses types (varchar(n)/char/json
  * → string).
  */
final case class ColumnModel(name: String, declaredType: String) {

  import ColumnModel._

  private val parsed = parseTypeString(declaredType)

  /** Base type name, lowercased, no size: `varchar(10)` → `varchar`. */
  def dtype: String = parsed.base

  def charSize: Option[Int] =
    if (isString) parsed.args.headOption else None
  def numericPrecision: Option[Int] =
    if (isNumeric) parsed.args.headOption else None
  def numericScale: Option[Int] =
    if (isNumeric) parsed.args.lift(1) else None

  def isString: Boolean = Set("varchar", "char", "string")(dtype)
  def isNumeric: Boolean = dtype == "decimal" || dtype == "numeric"
  def isFloat: Boolean = Set("real", "double", "float")(dtype)
  def isInteger: Boolean =
    Set("tinyint", "smallint", "integer", "int", "bigint")(dtype)

  /** Reference semantics: unbounded varchar reports the max Trino size
    * (column.py:10,24-27 string_size). */
  def stringSize: Int =
    if (!isString) throw new IllegalArgumentException(s"$name is not a string")
    else charSize.getOrElse(MaxVarcharSize)

  /** column.py:55-60 — `varchar` unbounded, else `varchar(n)` etc. */
  def stringType: String =
    if (charSize.isEmpty) "varchar" else s"$dtype(${charSize.get})"

  /** Can `other`'s values fit in this column's type without narrowing?
    * (dbt's expand-column-types: strings widen to the larger size,
    * numerics to the larger precision — BaseColumn semantics used by
    * incremental.sql:79-81.) */
  def canExpandTo(other: ColumnModel): Boolean =
    isString && other.isString && other.stringSize > stringSize

  def sparkType: DataType = toSparkType(declaredType)
}

object ColumnModel {

  /** Trino's max varchar length (column.py:10). */
  val MaxVarcharSize: Int = 2147483646

  private[model] final case class Parsed(base: String, args: Seq[Int])

  /** Parse `type`, `type(n)`, `type(p,s)`, `type with time zone`, ...
    * (column.py:62-109 from_description). */
  private[model] def parseTypeString(raw: String): Parsed = {
    val s = raw.trim.toLowerCase
    val m = """^([a-z_ ]+?)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)(.*)$""".r
    s match {
      case m(base, p, sNull, suffix) =>
        val args = Seq(p.toInt) ++ Option(sNull).map(_.toInt).toSeq
        Parsed((base + Option(suffix).getOrElse("")).trim, args)
      case _ => Parsed(s, Nil)
    }
  }

  /** dbt generic type labels → Trino (column.py:15-18 TYPE_LABELS and
    * utils/datatypes.sql:1-15). */
  def translateLabel(dtype: String): String = dtype.toUpperCase match {
    case "STRING" => "VARCHAR"
    case "FLOAT" => "DOUBLE"
    case "NUMERIC" => "DECIMAL(28,6)"
    case "INT" => "INTEGER"
    case other => other
  }

  /** Trino type string → Spark DataType (SURVEY §1.2 mapping table).
    * varchar(n)/char(n)/json collapse to StringType; the declared string
    * is preserved on the ColumnModel for round-trips. */
  def toSparkType(raw: String): DataType = {
    val p = parseTypeString(raw)
    p.base match {
      case "varchar" | "char" | "string" | "json" | "uuid" | "ipaddress" =>
        StringType
      case "varbinary" | "binary" => BinaryType
      case "boolean" => BooleanType
      case "tinyint" => ByteType
      case "smallint" => ShortType
      case "integer" | "int" => IntegerType
      case "bigint" | "long" => LongType
      case "real" | "float" => FloatType
      case "double" | "double precision" => DoubleType
      case "decimal" | "numeric" =>
        if (p.args.size == 2) DecimalType(p.args.head, p.args(1))
        else if (p.args.size == 1) DecimalType(p.args.head, 0)
        else DecimalType(28, 6) // default numeric, utils/datatypes.sql:9-11
      case "date" => DateType
      case "timestamp" | "timestamp without time zone" => TimestampType
      case "timestamp with time zone" => TimestampType
      // Trino's two interval kinds → Spark's storable ANSI interval
      // types (CalendarIntervalType cannot be written to tables/parquet)
      case "interval" | "interval day to second" => DayTimeIntervalType()
      case "interval year to month" => YearMonthIntervalType()
      case b if b.startsWith("array") =>
        // array(T) — recurse on the element type text
        val inner = raw.trim.stripPrefix("array").trim
          .stripPrefix("(").stripSuffix(")").stripPrefix("<").stripSuffix(">")
        ArrayType(toSparkType(inner))
      case other =>
        throw new IllegalArgumentException(s"unmapped Trino type: $other")
    }
  }

  /** Spark DataType → Trino type string (DESCRIBE parity direction). */
  def fromSparkType(dt: DataType): String = dt match {
    case StringType => "varchar"
    case BinaryType => "varbinary"
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case DateType => "date"
    case _: TimestampType => "timestamp"
    case _: DayTimeIntervalType => "interval day to second"
    case _: YearMonthIntervalType => "interval year to month"
    case ArrayType(e, _) => s"array(${fromSparkType(e)})"
    case MapType(k, v, _) => s"map(${fromSparkType(k)},${fromSparkType(v)})"
    case other => other.simpleString
  }

  /** Seed (CSV) schema inference, mirroring the agate rules of
    * impl.py:52-66 (verified by reference test_adapter.py:283-338):
    * text→VARCHAR; number→DOUBLE if any value has decimals else INTEGER;
    * datetime→TIMESTAMP; date→DATE; boolean→BOOLEAN.
    *
    * Input: the column's raw string values (as a CSV reader sees them).
    */
  // anchored value-class patterns shared by the local and the
  // distributed (Materializer.inferSeedTypes) inference paths
  val SeedIntRe = """^-?\d+$"""
  val SeedNumRe = """^-?\d+\.\d+([eE][+-]?\d+)?$"""
  val SeedDateRe = """^\d{4}-\d{2}-\d{2}$"""
  val SeedTsRe = """^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"""
  val SeedBoolRe = """^(?i)(true|false)$"""

  def inferSeedType(values: Seq[String]): String = {
    val present = values.filter(v => v != null && v.nonEmpty)
    if (present.isEmpty) return "VARCHAR"
    def all(re: String*) = present.forall(v => re.exists(v.matches))
    if (all(SeedBoolRe)) "BOOLEAN"
    else if (all(SeedIntRe)) "INTEGER"
    else if (all(SeedIntRe, SeedNumRe)) {
      // agate Number + MaxPrecision>0 → DOUBLE (impl.py:55-60)
      "DOUBLE"
    }
    else if (all(SeedDateRe)) "DATE"
    else if (all(SeedTsRe, SeedDateRe)) "TIMESTAMP"
    else "VARCHAR"
  }
}
