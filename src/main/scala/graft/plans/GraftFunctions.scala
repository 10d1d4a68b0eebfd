package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashSig, NormalizeNfc, RollingHash, ShingleHashes, SimHash60}

/** SQL-text surface for the engine's custom expressions: makes
  * `graft_rolling_hash(s)` and `graft_dot(a, b)` callable from
  * `spark.sql(...)` — either registered into an existing session
  * ([[register]]) or injected at session build time via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * ([[GraftExtensions]], the SparkSessionExtensions hook).
  *
  * Everything else in the dialect surface intentionally stays
  * `Column`-level: those are compositions of built-ins that Spark SQL
  * already expresses (SURVEY §2.4 maps each to its native spelling);
  * only the two genuine custom expressions need SQL names.
  */
object GraftFunctions {

  /** (name, arity-checked builder, usage) for each custom expression. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_rolling_hash",
      args => {
        require(args.length == 1, "graft_rolling_hash(str)")
        RollingHash(args.head)
      },
      "graft_rolling_hash(str) - polynomial rolling hash mod 2^31-1"),
    ("graft_dot",
      args => {
        require(args.length == 2, "graft_dot(arr, arr)")
        DotProduct(args.head, args(1))
      },
      "graft_dot(a, b) - double dot product of two numeric arrays"),
    ("graft_simhash60",
      args => {
        require(args.length == 1, "graft_simhash60(str)")
        SimHash60(args.head)
      },
      "graft_simhash60(str) - 60-bit SimHash over \\s+ tokens (null if none)"),
    ("graft_minhash",
      args => {
        require(args.length == 3, "graft_minhash(str, n, k)")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"graft_minhash: $what must be an integer literal")
        }
        MinHashSig(args.head, intLit(args(1), "n"), intLit(args(2), "k"))
      },
      "graft_minhash(str, n, k) - k-value MinHash over n-gram shingles"),
    ("graft_nfc",
      args => {
        require(args.length == 1, "graft_nfc(str)")
        NormalizeNfc(args.head)
      },
      "graft_nfc(str) - Unicode NFC canonical composition"),
    ("graft_shingle_hashes",
      args => {
        require(args.length == 2, "graft_shingle_hashes(str, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "graft_shingle_hashes: n must be an integer literal")
        }
        ShingleHashes(args.head, n)
      },
      "graft_shingle_hashes(str, n) - rolling hashes of word n-gram shingles"))

  /** Register into an already-built session. Register-if-absent: the
    * builders are stateless, so a name already present IS this
    * function — re-registering would only emit a "replaced a
    * previously registered function" WARN per name per query. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, usage) =>
      val reg = spark.sessionState.functionRegistry
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id,
          new ExpressionInfo("graft", name, usage), builder)
    }
}

/** `spark.sql.extensions` entry point (injectFunction at build time). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}
