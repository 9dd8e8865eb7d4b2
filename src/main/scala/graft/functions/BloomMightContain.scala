package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch
  * behind `df.stat.bloomFilter`; Spark's own runtime row-level
  * filtering uses the same idea via its internal
  * BloomFilterMightContain, which is not SQL-registered in 4.1).
  *
  * The filter object ships to executors as a referenced object inside
  * the generated code (java-serialized once per plan, not per row), so
  * the probe stays inside whole-stage codegen — no row UDF. Input is a
  * LONG key (hash wide types first, e.g. xxhash64); null → null.
  * False positives possible, false negatives never — callers must
  * treat `true` as "maybe" (see [[graft.ops.BloomPrune]]).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom probe needs a LONG key, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  /** Column-level probe: true if `key` (long) might be in `bloom`. */
  def probe(key: Column, bloom: BloomFilter): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), bloom))
  }
}
