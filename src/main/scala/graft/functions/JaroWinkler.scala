package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a codegen'd Catalyst expression — the
  * fuzzy-name comparator of record-linkage stacks (Winkler 1990,
  * building on Jaro 1989; the same definition DuckDB ships as
  * `jaro_winkler_similarity`, which is what puts this scorer on a
  * value-equality oracle): Jaro similarity from windowed matches and
  * half-transpositions, plus the Winkler common-prefix boost
  * (p = 0.1, prefix capped at 4) applied only when Jaro > 0.7.
  *
  * Spark has no built-in string-similarity scorer beyond levenshtein;
  * a Scala UDF here would sit in the inner loop of an ER candidate
  * join, so this is an `Expression` with `doGenCode` delegating to one
  * static method (the [[WordNgramsExpr]] pattern) — no boxing, no
  * interpreter, stays inside whole-stage codegen. Comparison is by
  * UTF-16 code unit on both engines' BMP text (the blocking keys ER
  * pipelines compare are names/titles); null input yields null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires string inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinkler {

  /** Standard Jaro-Winkler: match window floor(max/2)-1,
    * half-transposition count, prefix boost l*0.1*(1-j) with l <= 4,
    * boost only above the 0.7 threshold. Either side empty -> 0. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars in order, count disagreements
    var halfT = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = halfT / 2
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column API with automatic string cast. */
  def jw(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a.cast("string")),
      ColumnBridge.expression(b.cast("string"))))
  }
}
