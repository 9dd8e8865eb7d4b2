package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD via
  * `java.text.Normalizer`) — the canonicalization step of web-text
  * cleaning pipelines, which Spark has no built-in function for.
  * One static call per row inside whole-stage codegen; the common case
  * (already-normalized ASCII/NFC text) short-circuits on
  * `Normalizer.isNormalized`, which is a cheap quick-check pass that
  * avoids allocating a new string for the ~99% of web text that is
  * already composed.
  *
  * `Normalizer.normalize` is total on arbitrary (even ill-formed)
  * strings — no hostile-input failure mode.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalizeExpr.forms.contains(form),
    s"unknown normalization form $form (expected NFC|NFD|NFKC|NFKD)")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string input, got " +
          child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormalizeExpr.compute($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {

  private[functions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val s = text.toString
    if (Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  /** Column API. */
  def normalize(c: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      UnicodeNormalizeExpr(ColumnBridge.expression(c.cast("string")), form))
  }
}
