package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's custom Catalyst expressions: the engine is a
  * library, so its scalar primitives should be reachable from
  * `spark.sql(...)` too, not just the Column API. Two entry points:
  *
  *   - new sessions: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `.withExtensions(new GraftExtensions)`) — the standard
  *     SparkSessionExtensions hook;
  *   - an existing session (REPL, tests): `GraftFunctions.register(spark)`.
  *
  * Registered functions:
  *   - `graft_dot(array<double>, array<double>)` — codegen'd dot product
  *     ([[ArrayDot]]).
  *   - `graft_word_ngrams(text[, n[, distinct]])` — codegen'd word
  *     n-gram array ([[WordNgramsExpr]]); n and distinct must be
  *     literals (they parameterize the generated code).
  *   - `graft_normalize(text[, form])` — codegen'd Unicode NFC/NFD/
  *     NFKC/NFKD normalization ([[UnicodeNormalizeExpr]]).
  */
object GraftFunctions {

  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => ArrayDot(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_dot expects (array<double>, array<double>)")
  }

  private def ngramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => WordNgramsExpr(text, 1, distinct = false)
    case Seq(text, Literal(n: Int, _)) =>
      WordNgramsExpr(text, n, distinct = false)
    case Seq(text, Literal(n: Int, _), Literal(d: Boolean, _)) =>
      WordNgramsExpr(text, n, d)
    case _ => throw new IllegalArgumentException(
      "graft_word_ngrams expects (text[, n literal[, distinct literal]])")
  }

  private def normalizeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => UnicodeNormalizeExpr(text, "NFC")
    case Seq(text, Literal(f, _)) =>
      UnicodeNormalizeExpr(text, String.valueOf(f).toUpperCase)
    case _ => throw new IllegalArgumentException(
      "graft_normalize expects (text[, form literal in NFC|NFD|NFKC|NFKD])")
  }

  private def jaroWinklerBuilder(args: Seq[Expression]): Expression =
    args match {
      case Seq(a, b) => JaroWinkler(a, b)
      case _ => throw new IllegalArgumentException(
        "graft_jaro_winkler expects (string, string)")
    }

  private def hilbertBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(x, y, Literal(bits: Int, _)) => HilbertIndexExpr(x, y, bits)
    case _ => throw new IllegalArgumentException(
      "graft_hilbert expects (bigint, bigint, bits literal)")
  }

  private def topKBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(ord, id, kLit @ Literal(_, _)) =>
      BoundedTopK(ord, id, kLit).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "graft_top_k expects (ord, id, k literal)")
  }

  /** (identifier, info, builder) triples in the shape
    * SparkSessionExtensions.injectFunction consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        dotBuilder _),
      (FunctionIdentifier("graft_word_ngrams"),
        new ExpressionInfo(classOf[WordNgramsExpr].getName, "graft_word_ngrams"),
        ngramsBuilder _),
      (FunctionIdentifier("graft_normalize"),
        new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "graft_normalize"),
        normalizeBuilder _),
      (FunctionIdentifier("graft_top_k"),
        new ExpressionInfo(classOf[BoundedTopK].getName, "graft_top_k"),
        topKBuilder _),
      (FunctionIdentifier("graft_jaro_winkler"),
        new ExpressionInfo(classOf[JaroWinkler].getName,
          "graft_jaro_winkler"),
        jaroWinklerBuilder _),
      (FunctionIdentifier("graft_hilbert"),
        new ExpressionInfo(classOf[HilbertIndexExpr].getName,
          "graft_hilbert"),
        hilbertBuilder _))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point: the SQL function surface plus
  * the range-join bin rewrite ([[graft.plans.RangeJoinBinRule]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBinRule)
  }
}
