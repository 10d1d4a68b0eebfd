package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index of the nearest centroid (squared euclidean, 0-based) of a
  * numeric array column against a TRAINED centroid matrix — one native
  * codegen'd argmin loop whose generated code is CONSTANT-SIZE in the
  * number of centroids (the matrix lives in the references array, not
  * in the generated source).
  *
  * Why an Expression and not the unrolled/HOF column forms
  * (r15 — the ivfTopKRp join probe): the composed forms depend on the
  * OPTIMIZER keeping the argmin's input staged. Under a join,
  * ColumnPruning re-synthesizes the pruned projection with the input
  * expression INLINED into the argmin — and the loop form is a
  * higher-order `transform`, which evaluates INTERPRETED, re-computing
  * the inlined input once PER CENTROID ELEMENT (measured: the 16-dot
  * JL projection inlined into a 3,200-centroid argmin turned a 0.9 s
  * assignment into a 29 s join stage — nlist×dOut extra dots per
  * row). An Expression evaluates its child exactly once by
  * construction, in every plan position, and its codegen is one fused
  * loop.
  *
  * Arithmetic is BIT-IDENTICAL to the unrolled/loop column forms
  * (LlmSpec pins all three cell-for-cell): per centroid c,
  * score = dot(vec, c) · (−2) + Σc², dot accumulated left-to-right in
  * double over the shorter length ([[DotProduct]]'s rule), Σc² a
  * driver-side left fold; the argmin keeps the FIRST minimum
  * (`<` — NaN scores are never less, matching array_min's
  * NaN-greatest ordering). A NULL vector yields NULL; a null ELEMENT
  * within the compared range poisons every score in the unrolled form
  * (null dot → null score → null array_min) and yields NULL here
  * too.
  *
  * INTENTIONAL divergence on all-NaN scores (a NaN element in the
  * input vector makes every centroid's score NaN): this expression
  * returns NULL — there is no nearest centroid — while the column
  * form's `array_position(s, array_min(s))` returns cell 0 under
  * Spark's NaN-equals/NaN-greatest semantics (array_min of an
  * all-NaN array is NaN, and array_position finds it at slot 1).
  * "Assigned to cell 0" is an arbitrary artifact of NaN ordering,
  * not a meaningful assignment, so NULL is the deliberate contract;
  * the LlmSpec cell-for-cell equality pin therefore covers NaN-free
  * inputs only (the trained-embedding corpora it runs on). Same rule
  * in [[TwoLevelNearestCentroid]]. */
case class NearestCentroid(child: Expression,
                           centroids: Seq[Seq[Double]],
                           projection: Option[Seq[Seq[Double]]] = None)
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroid matrix is empty")
  require(centroids.forall(_.length == centroids.head.length),
    "centroid rows must share one dimension")
  // with a projection, the centroids are in the PROJECTED space:
  // row count of the projection = centroid dimension
  projection.foreach { m =>
    require(m.nonEmpty && m.forall(_.length == m.head.length),
      "projection rows must share one dimension")
    require(m.length == centroids.head.length,
      s"projection emits ${m.length} dims but centroids have " +
        s"${centroids.head.length}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if Seq(FloatType, DoubleType, IntegerType,
        LongType, ShortType).contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric array input, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"
  // nullable even over a non-null array column: element nulls poison
  // the scores (the unrolled form's null-dot contract)
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val c2s: Array[Double] =
    centroids.map(_.map(x => x * x).sum).toArray
  @transient private lazy val projM: Array[Array[Double]] =
    projection.map(_.map(_.toArray).toArray).orNull

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = elemType
    // with a fused projection, the INPUT dimension is the projection
    // row length (the [[graft.llm.Similarity.rpProject]] rule: dot
    // over the shorter of vector and projection row); without, the
    // centroid dimension bounds the read
    val inDim =
      if (projM != null) projM(0).length else cents.head.length
    val nIn = math.min(a.numElements(), inDim)
    var i = 0
    while (i < nIn) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val raw = new Array[Double](nIn)
    i = 0
    while (i < nIn) { raw(i) = get(a, t, i); i += 1 }
    // projected form: vec = M·raw (left-to-right double accumulation
    // per component — bit-identical to rpProject's DotProduct rows)
    val vec =
      if (projM == null) raw
      else {
        val out = new Array[Double](projM.length)
        var tIdx = 0
        while (tIdx < projM.length) {
          val row = projM(tIdx)
          var acc = 0.0
          var k = 0
          while (k < nIn) { acc += raw(k) * row(k); k += 1 }
          out(tIdx) = acc
          tIdx += 1
        }
        out
      }
    val n = math.min(vec.length, cents.head.length)
    var best = Double.NaN
    var bestIdx = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += vec(k) * c(k); k += 1 }
      val score = acc * -2.0 + c2s(j)
      // first minimum; NaN is never `<`, matching array_min's
      // NaN-greatest ordering
      if (bestIdx < 0 && !java.lang.Double.isNaN(score)) {
        best = score; bestIdx = j
      } else if (score < best) { best = score; bestIdx = j }
      j += 1
    }
    if (bestIdx < 0) null else bestIdx
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
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents,
        "double[][]")
      val c2Ref = ctx.addReferenceObj("c2s", c2s, "double[]")
      val projRef =
        if (projM == null) null
        else ctx.addReferenceObj("projM", projM, "double[][]")
      val nIn = ctx.freshName("nIn")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val raw = ctx.freshName("raw")
      val vec = ctx.freshName("vec")
      val acc = ctx.freshName("acc")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val c = ctx.freshName("c")
      val poisoned = ctx.freshName("poisoned")
      val inDimExpr =
        if (projRef == null) s"$centsRef[0].length"
        else s"$projRef[0].length"
      val project =
        if (projRef == null) s"double[] $vec = $raw;\nint $n = $nIn;"
        else
          s"""double[] $vec = new double[$projRef.length];
             |for (int $j = 0; $j < $projRef.length; $j++) {
             |  double $acc = 0.0;
             |  for (int $k = 0; $k < $nIn; $k++) {
             |    $acc += $raw[$k] * $projRef[$j][$k];
             |  }
             |  $vec[$j] = $acc;
             |}
             |int $n = $vec.length;""".stripMargin
      s"""
         |int $nIn = java.lang.Math.min($v.numElements(), $inDimExpr);
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $nIn; $i++) {
         |  if ($v.isNullAt($i)) { $poisoned = true; break; }
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $raw = new double[$nIn];
         |  for (int $i = 0; $i < $nIn; $i++) {
         |    $raw[$i] = ${genGet(elemType, v, i)};
         |  }
         |  $project
         |  double $best = Double.NaN;
         |  int $bestIdx = -1;
         |  for (int $j = 0; $j < $centsRef.length; $j++) {
         |    double[] $c = $centsRef[$j];
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $acc += $vec[$k] * $c[$k];
         |    }
         |    double $score = $acc * -2.0 + $c2Ref[$j];
         |    if ($bestIdx < 0 && !Double.isNaN($score)) {
         |      $best = $score; $bestIdx = $j;
         |    } else if ($score < $best) {
         |      $best = $score; $bestIdx = $j;
         |    }
         |  }
         |  if ($bestIdx < 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $bestIdx; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {
  /** Column-level entry point. */
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(vec),
      centroids.map(_.toSeq).toSeq))

  /** Argmin with the JL projection FUSED into the expression: the raw
    * vector is read once, projected (`projection` rows ·raw, the
    * [[graft.llm.Similarity.rpProject]] arithmetic, bit-identical),
    * and scored against the PROJECTED `centroids` — no intermediate
    * projected-array column exists in the plan at all (r15: the
    * staged CreateArray-of-dots projection measured ~30 µs/row —
    * 10× the fused argmin itself — once the argmin went native). */
  def projected(vec: Column, centroids: Array[Array[Double]],
                projection: Array[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(vec),
      centroids.map(_.toSeq).toSeq,
      Some(projection.map(_.toSeq).toSeq)))
}
