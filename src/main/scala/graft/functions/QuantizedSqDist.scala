package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Per-element-QUANTIZED squared Euclidean distance over two
  * `array<double>` columns: Σᵢ floor((xᵢ−yᵢ)²·10¹² + ½) as an exact
  * long — the engine-portable distance the exact-neighbor tools rank
  * on (every term is an integer, so the sum is order-invariant and a
  * DuckDB list comprehension reproduces it bit-for-bit; a raw double
  * Σ(x−y)² would be accumulation-order-sensitive and engine-skewed in
  * the last ulp, exactly where distance TIES decide neighbors).
  *
  * Codegen'd for the same reason as [[ArrayDot]]: the equivalent
  * `aggregate(zip_with(...))` higher-order form runs INTERPRETED per
  * element — measured unusable inside O(n²) scoring loops.
  * Mismatched lengths use the shorter prefix; null input yields null.
  */
case class QuantizedSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // always nullable: a null ELEMENT nulls the result even when both
  // array columns are non-nullable, and codegen needs ev.isNull to be
  // a real variable for the in-loop assignment
  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_qsqdist requires array<double> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null ELEMENT nulls the whole distance (an UnsafeArrayData
      // would otherwise silently read the slot as 0.0)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      val t = d * d * 1e12 + 0.5
      // overflow fails LOUDLY instead of wrapping: a per-element diff
      // beyond ~3e3 quantizes past 2^63 ((long) of an oversized double
      // saturates, then the sum wraps) — silent ranking corruption for
      // large-magnitude vectors. addExact guards the accumulation.
      if (t >= 9.223372036854776e18) throw QuantizedSqDist.overflow(d)
      acc = Math.addExact(acc, math.floor(t).toLong)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true; break;
          }
          double $d = $a.getDouble($i) - $b.getDouble($i);
          double ${d}t = $d * $d * 1e12 + 0.5;
          if (${d}t >= 9.223372036854776e18) {
            throw graft.functions.QuantizedSqDist.overflow($d);
          }
          $acc = java.lang.Math.addExact($acc,
            (long) java.lang.Math.floor(${d}t));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedSqDist =
    copy(left = newLeft, right = newRight)
}

object QuantizedSqDist {
  /** Loud per-element overflow (called from interpreted AND generated
    * code): the kernel's documented magnitude bound is
    * |xᵢ−yᵢ| < ~3.0e3 (then (xᵢ−yᵢ)²·10¹² reaches 2^63). */
  def overflow(d: Double): ArithmeticException =
    new ArithmeticException(
      f"graft_qsqdist overflow: per-element difference $d%.6g " +
        "quantizes past 2^63 (|x-y| must stay below ~3.0e3); rescale " +
        "the vectors before ranking on the quantized distance")

  /** Column API: qsqdist(a, b) with automatic cast to array<double>. */
  def qsqdist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(QuantizedSqDist(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  }
}
