package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric array columns, accumulated in double in
  * index order — one codegen'd loop over the Tungsten array data.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation
  * on the ANN hot paths (LSH bucket codes compute `planes` dots per
  * vector; cosine re-rank computes three per candidate). The HOF form
  * materializes an intermediate array and interprets two lambdas per
  * element; this is a fused multiply-add loop. Identical arithmetic:
  * left-to-right IEEE double accumulation, so oracle parity holds.
  *
  * A null ELEMENT in the overlapped range null-propagates the whole
  * result — the same semantics as the replaced HOF form (and of the
  * DuckDB oracle's list arithmetic, where NULL*x poisons the sum). The
  * shorter length bounds the loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: DecimalType, _) => true
      case ArrayType(t, _) => Seq(FloatType, DoubleType, IntegerType,
        LongType, ShortType).contains(t)
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs numeric array inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // nullable even when the array columns aren't: element nulls
  // null-propagate the result
  override def nullable: Boolean = super.nullable ||
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, lt, i) * get(ra, rt, i)
      i += 1
    }
    acc
  }

  private def genGet(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val lg = genGet(elemType(left), l, i)
      val rg = genGet(elemType(right), r, i)
      // when nullable is false (non-nullable inputs, containsNull=false on
      // both) ev.isNull is the literal `false`, so emitting an assignment
      // would generate `false = true;` and fail janino compilation — and
      // elements can never be null there, so the check is dead code anyway
      val nullCheck =
        if (nullable)
          s"""if ($l.isNullAt($i) || $r.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }""".stripMargin
        else ""
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $lg * $rg;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
