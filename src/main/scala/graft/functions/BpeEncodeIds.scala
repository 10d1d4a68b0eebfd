package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** BPE encode-to-ids: a document's tokenized word array → one flat
  * `array<int>` of vocabulary ids — the token-id column a training
  * pipeline actually writes. Per word, the ordered merge list is
  * applied ([[BpeSymbols]] semantics — left-to-right scan per merge,
  * in merge order) and each resulting symbol is mapped through the
  * vocabulary; symbols outside the vocabulary encode as -1 (UNK).
  *
  * Tokenization stays OUTSIDE the expression (the caller passes the
  * same codegen'd `tokens(lower(text))` column every other text
  * operator uses), so oracle parity for the split is inherited, and
  * this expression is a pure per-word loop. The flat id stream does
  * not mark word boundaries — a tokenizer needing exact detokenization
  * should put an end-of-word sentinel in the base alphabet (GPT-2
  * style leading-space marking), which is a vocab choice, not an
  * engine change. Map-only — encoding a
  * 100 TB corpus is an embarrassingly parallel projection with the
  * merge list and the id map riding as reference objects (the
  * literal-explosion and HOF-CodegenFallback lessons from r6 both
  * apply verbatim here). NULL word array → NULL; NULL elements
  * contribute nothing.
  */
case class BpeEncodeIds(child: Expression, merges: Array[String],
                        vocab: Array[String])
    extends UnaryExpression {

  require(merges.length % 2 == 0, "merges must be (l, r) pairs, flattened")

  @transient private lazy val idMap: java.util.HashMap[String, Integer] =
    BpeEncodeIds.buildMap(vocab)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode_ids"

  override def nullSafeEval(input: Any): Any =
    BpeEncodeIds.compute(input.asInstanceOf[ArrayData], merges, idMap)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val ids = ctx.addReferenceObj("bpeIdMap", idMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BpeEncodeIds.compute($c, $m, $ids);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeIds = copy(child = newChild)
}

object BpeEncodeIds {
  /** Column entry point; `words` is an array<string> column, `vocab`
    * the id-ordered symbol list (position = id). */
  def apply(words: Column, merges: Seq[(String, String)],
            vocab: Seq[String]): Column =
    GraftColumnBridge.column(BpeEncodeIds(
      GraftColumnBridge.expression(words),
      merges.flatMap(p => Seq(p._1, p._2)).toArray,
      vocab.toArray))

  def buildMap(vocab: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) {
      // first occurrence wins — duplicate merge products keep low ids
      if (!m.containsKey(vocab(i))) m.put(vocab(i), i)
      i += 1
    }
    m
  }

  /** Called from generated code — keep the signature stable. */
  def compute(words: ArrayData, merges: Array[String],
              idMap: java.util.HashMap[String, Integer]): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val syms = BpeSymbols.symbolList(words.getUTF8String(i).toString,
          merges)
        var j = 0
        while (j < syms.size) {
          val id = idMap.get(syms.get(j))
          out.add(if (id == null) Integer.valueOf(-1) else id)
          j += 1
        }
      }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k).intValue(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}
