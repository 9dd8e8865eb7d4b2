package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram array: lowercase, split on whitespace runs,
  * join each n-word window with single spaces; `distinct` keeps the
  * first occurrence of each gram (array_distinct order).
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(" ",
  * slice(words, i, n)))` higher-order chain: HOFs evaluate interpreted,
  * one lambda frame per element, outside whole-stage codegen — measured
  * ~3-4 s per shingle build over 5000 small documents at sf0.1, vs one
  * static call per row here that stays inside WSCG. Semantics are
  * bit-identical to the HOF form (WordNgramsSpec asserts it): documents
  * with fewer than n words yield an empty array.
  */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams requires a string input, got " +
          child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramsExpr.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object WordNgramsExpr {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** One pass per row: lowercase (UTF8String semantics, as Spark's
    * `lower`), regex whitespace split, windowed join. Called from both
    * interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val parts = Whitespace.split(text.toLowerCase.toString)
    val words = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) words.add(parts(i))
      i += 1
    }
    val m = words.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = if (distinct) new java.util.LinkedHashSet[String]() else null
    val lst = if (distinct) null else new java.util.ArrayList[String](m - n + 1)
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p <= m - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(p + k))
        k += 1
      }
      val g = sb.toString
      if (distinct) seen.add(g) else lst.add(g)
      p += 1
    }
    val src: java.util.Collection[String] = if (distinct) seen else lst
    val out = new Array[Any](src.size)
    val it = src.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API. n = 1 with distinct = true gives the distinct-word set;
    * distinct = false keeps multiplicity (repetition analysis). */
  def ngrams(c: Column, n: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      WordNgramsExpr(ColumnBridge.expression(c.cast("string")), n, distinct))
  }
}
