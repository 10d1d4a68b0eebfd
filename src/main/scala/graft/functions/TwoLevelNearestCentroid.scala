package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** GLOBAL index of the nearest centroid through a two-level coarse
  * quantizer — [[NearestCentroid]]'s composed sibling (r15): the
  * super-centroid argmin picks a group, and only that group's member
  * centroids are scored (ncoarse + |group| score evaluations per row
  * instead of nlist — the IVFADC coarse-quantizer lever), all inside
  * ONE native expression. Optionally the JL projection is fused first
  * ([[NearestCentroid.projected]]'s rule), so the 100 TB serving
  * shape — project, super argmin, group argmin — is a single
  * codegen'd pass over the raw vector with zero intermediate columns:
  * nothing for ColumnPruning to inline, no interpreted HOF loops (the
  * column composition's group `transform` re-evaluated its input per
  * member element under join pruning — the r15 NearestCentroid
  * finding, which applied to this path through `cellInGroupLoop` the
  * same way), and generated code constant-size in both ncoarse and
  * nlist.
  *
  * Arithmetic is bit-identical to the column composition
  * (`ivfAssignTwoLevelLoop` — LlmSpec pins cell-for-cell): scores are
  * dot·(−2)+Σc² with left-to-right double dots, both argmins keep the
  * FIRST minimum (NaN never less), the returned id is the GLOBAL
  * centroid index of the group-local winner, and a NULL vector or a
  * null element within the compared range yields NULL. All-NaN
  * scores (a NaN input element) return NULL here, intentionally
  * diverging from the column form's arbitrary cell-0 artifact — see
  * [[NearestCentroid]]'s NaN note; the equality pin covers NaN-free
  * inputs only. */
case class TwoLevelNearestCentroid(child: Expression,
                                   coarse: Seq[Seq[Double]],
                                   members: Seq[Seq[Int]],
                                   centroids: Seq[Seq[Double]],
                                   projection: Option[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(coarse.nonEmpty && members.length == coarse.length,
    "one member group per super-centroid required")
  require(members.forall(_.nonEmpty), "member groups must be non-empty")
  require(centroids.nonEmpty &&
    centroids.forall(_.length == centroids.head.length) &&
    coarse.forall(_.length == centroids.head.length),
    "coarse and member centroids must share one dimension")
  projection.foreach(m => require(
    m.nonEmpty && m.forall(_.length == m.head.length) &&
      m.length == centroids.head.length,
    "projection must emit the centroid dimension"))

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
  override def prettyName: String = "graft_nearest_centroid_2l"
  override def nullable: Boolean = true

  @transient private lazy val coarseM: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val coarse2: Array[Double] =
    coarse.map(_.map(x => x * x).sum).toArray
  // per-group member centroid matrices + their global ids + Σc² —
  // flattened model-sized driver state shipped via references
  @transient private lazy val groupIds: Array[Array[Int]] =
    members.map(_.toArray).toArray
  @transient private lazy val groupCents: Array[Array[Array[Double]]] =
    members.map(_.map(m => centroids(m).toArray).toArray).toArray
  @transient private lazy val groupC2: Array[Array[Double]] =
    members.map(_.map(m => centroids(m).map(x => x * x).sum).toArray)
      .toArray
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

  private def argmin(vec: Array[Double], n: Int,
                     cs: Array[Array[Double]],
                     c2: Array[Double]): Int = {
    var best = Double.NaN
    var bestIdx = -1
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += vec(k) * c(k); k += 1 }
      val score = acc * -2.0 + c2(j)
      if (bestIdx < 0 && !java.lang.Double.isNaN(score)) {
        best = score; bestIdx = j
      } else if (score < best) { best = score; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = elemType
    val inDim =
      if (projM != null) projM(0).length else coarseM.head.length
    val nIn = math.min(a.numElements(), inDim)
    var i = 0
    while (i < nIn) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val raw = new Array[Double](nIn)
    i = 0
    while (i < nIn) { raw(i) = get(a, t, i); i += 1 }
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
    val n = math.min(vec.length, coarseM.head.length)
    val sup = argmin(vec, n, coarseM, coarse2)
    if (sup < 0) return null
    val local = argmin(vec, n, groupCents(sup), groupC2(sup))
    if (local < 0) null else groupIds(sup)(local)
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
      val coarseRef = ctx.addReferenceObj("coarseM", coarseM, "double[][]")
      val coarse2Ref = ctx.addReferenceObj("coarse2", coarse2, "double[]")
      val gidsRef = ctx.addReferenceObj("groupIds", groupIds, "int[][]")
      val gcRef = ctx.addReferenceObj("groupCents", groupCents,
        "double[][][]")
      val gc2Ref = ctx.addReferenceObj("groupC2", groupC2, "double[][]")
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
      val cs = ctx.freshName("cs")
      val c2 = ctx.freshName("c2")
      val sup = ctx.freshName("sup")
      val poisoned = ctx.freshName("poisoned")
      val inDimExpr =
        if (projRef == null) s"$coarseRef[0].length"
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
      // one argmin routine emitted twice (super + group) — constant
      // code size either way
      def argminCode(csExpr: String, c2Expr: String): String =
        s"""double $best = Double.NaN;
           |int $bestIdx = -1;
           |for (int $j = 0; $j < $csExpr.length; $j++) {
           |  double[] $c = $csExpr[$j];
           |  double $acc = 0.0;
           |  for (int $k = 0; $k < $n; $k++) {
           |    $acc += $vec[$k] * $c[$k];
           |  }
           |  double $score = $acc * -2.0 + $c2Expr[$j];
           |  if ($bestIdx < 0 && !Double.isNaN($score)) {
           |    $best = $score; $bestIdx = $j;
           |  } else if ($score < $best) {
           |    $best = $score; $bestIdx = $j;
           |  }
           |}""".stripMargin
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
         |  int $sup;
         |  {
         |    ${argminCode(coarseRef, coarse2Ref)}
         |    $sup = $bestIdx;
         |  }
         |  if ($sup < 0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double[][] $cs = $gcRef[$sup];
         |    double[] $c2 = $gc2Ref[$sup];
         |    ${argminCode(cs, c2)}
         |    if ($bestIdx < 0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $gidsRef[$sup][$bestIdx]; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TwoLevelNearestCentroid =
    copy(child = newChild)
}

object TwoLevelNearestCentroid {
  /** Column-level entry point (full-width). */
  def apply(vec: Column, coarse: Array[Array[Double]],
            members: Array[Array[Int]],
            centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(TwoLevelNearestCentroid(
      GraftColumnBridge.expression(vec),
      coarse.map(_.toSeq).toSeq, members.map(_.toSeq).toSeq,
      centroids.map(_.toSeq).toSeq, None))

  /** Column-level entry point with the JL projection fused first:
    * `coarse` and `centroids` are in the PROJECTED space. */
  def projected(vec: Column, coarse: Array[Array[Double]],
                members: Array[Array[Int]],
                centroids: Array[Array[Double]],
                projection: Array[Array[Double]]): Column =
    GraftColumnBridge.column(TwoLevelNearestCentroid(
      GraftColumnBridge.expression(vec),
      coarse.map(_.toSeq).toSeq, members.map(_.toSeq).toSeq,
      centroids.map(_.toSeq).toSeq,
      Some(projection.map(_.toSeq).toSeq)))
}
