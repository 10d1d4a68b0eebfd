package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization code assignment as ONE native expression: for
  * each of `m` subspaces, the index of the nearest codebook centroid to
  * the row's subvector — `array<int>` of length m.
  *
  * Exists because the composed-Column form (an `array_position(array_min)`
  * over an ARRAY of m·ksub literal `DotProduct`s) explodes into a
  * 512-term projection at the default PQ shape: whole-stage codegen
  * recompiles it on every Lloyd's round (the centroid literals change),
  * and compilation — not arithmetic — dominated the sf0.1 bench at 25 s
  * per `sim_pq_topk` run. Here the codebook rides along as ONE flat
  * `double[]` reference object (never serialized into generated source),
  * and codegen emits a single static call; the m·ksub·subdim loop lives
  * in [[PqAssignCodes.compute]], JIT-compiled once regardless of shape.
  * Bench effect: sim_pq_topk 24.9 s → 1.1 s at sf0.1.
  *
  * Distance is squared L2, accumulated left-to-right in double (floats
  * widened per element, the [[DotProduct]] convention); ties take the
  * LOWEST centroid index — same rule as `Similarity.nearestCell`'s
  * array_position-of-min. A vector shorter than (j+1)·subdim treats the
  * missing dimensions as 0, as are null ELEMENTS (parquet list schemas
  * carry containsNull=true even for fully-populated data). NULL vector
  * → NULL codes.
  */
case class PqAssignCodes(child: Expression, codebook: Array[Double],
                         m: Int, ksub: Int, subdim: Int)
    extends UnaryExpression {

  require(codebook.length == m * ksub * subdim,
    s"codebook length ${codebook.length} != $m*$ksub*$subdim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float|double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_assign"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqAssignCodes.compute(input.asInstanceOf[ArrayData], codebook,
      m, ksub, subdim, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqAssignCodes.compute(
         |  $c, $cb, $m, $ksub, $subdim, $isFloat);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAssignCodes = copy(child = newChild)
}

object PqAssignCodes {
  /** Column entry point; `codebook(j)(c)` is centroid c of subspace j. */
  def apply(vec: Column, codebook: Array[Array[Array[Double]]]): Column = {
    val m = codebook.length
    val ksub = codebook.head.length
    val subdim = codebook.head.head.length
    GraftColumnBridge.column(PqAssignCodes(
      GraftColumnBridge.expression(vec),
      codebook.flatten.flatten, m, ksub, subdim))
  }

  /** Called from generated code — keep the signature stable. */
  def compute(ad: ArrayData, cb: Array[Double], m: Int, ksub: Int,
              subdim: Int, isFloat: Boolean): ArrayData = {
    val n = ad.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * subdim
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val vi = j * subdim + i
          val x = if (vi >= n || ad.isNullAt(vi)) 0.0
            else if (isFloat) ad.getFloat(vi).toDouble
            else ad.getDouble(vi)
          val diff = x - cb(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest c
        c += 1
      }
      codes(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }
}
