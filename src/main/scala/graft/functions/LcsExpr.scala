package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact longest-common-substring via a SUFFIX AUTOMATON, as a
  * codegen'd Catalyst expression — the character-precision verifier
  * behind the winnowing candidate family (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 verify their
  * fingerprint candidates with exact suffix structures; reference
  * repo has no substring operators at all). Fingerprints witness
  * "these documents share SOME k-token run"; this closes the loop to
  * the exact maximal shared span at character precision.
  *
  * `graft_lcs(a, b)` → struct<len: bigint, b_start: bigint>:
  * the length of the longest substring common to `a` and `b`, and
  * the 1-BASED start (in Unicode code points) of its EARLIEST-ENDING
  * occurrence in `b` (the deterministic tie-break: among maximal
  * matches, smallest end position in `b`, hence smallest start).
  * `len = 0` (no common character) yields `(0, 0)`. The start in `a`
  * is intentionally not emitted — `locate(substring(b, b_start,
  * len), a)` recovers its first occurrence with engine-portable
  * semantics, which is what the gate row does.
  *
  * Cost: automaton build O(|a|) states/transitions, one O(|b|) walk —
  * linear per pair where the classic DP is O(|a|·|b|). Document-pair
  * LOCAL (no state outside the row), so verification over the
  * df-guarded candidate pairs is pure map work after the candidate
  * join, exactly like [[WinnowExpr]] fingerprinting. A Scala UDF here
  * would box both strings per row inside the verify join's hot loop;
  * this stays a static call inside whole-stage codegen. Comparison is
  * by Unicode code point on both engines (DuckDB substr/strpos are
  * code-point based). Null on either side yields null.
  */
case class LcsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LcsExpr.OutType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_lcs requires string inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lcs"
}

object LcsExpr {

  val OutType: StructType = StructType(Seq(
    StructField("len", LongType, nullable = false),
    StructField("b_start", LongType, nullable = false)))

  /** Build the suffix automaton of `a` (Blumer et al. 1985 online
    * construction, ≤ 2|a| states), then walk `b` tracking the longest
    * suffix of b[0..q] that is a substring of `a`. Strictly-greater
    * update keeps the earliest-ending maximal match. Called from
    * interpreted eval and generated code. */
  def compute(aU: UTF8String, bU: UTF8String): GenericInternalRow = {
    val a = aU.toString.codePoints().toArray
    val b = bU.toString.codePoints().toArray
    if (a.isEmpty || b.isEmpty)
      return new GenericInternalRow(Array[Any](0L, 0L))

    val maxSt = 2 * a.length + 4
    val len = new Array[Int](maxSt)
    val link = new Array[Int](maxSt)
    val next = new Array[java.util.HashMap[Integer, Integer]](maxSt)
    next(0) = new java.util.HashMap[Integer, Integer]()
    link(0) = -1
    var last = 0
    var size = 1

    var ai = 0
    while (ai < a.length) {
      val c: Integer = a(ai)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      next(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p != -1 && !next(p).containsKey(c)) {
        next(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = next(p).get(c).intValue()
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          next(clone) = new java.util.HashMap[Integer, Integer](next(q))
          while (p != -1 && {
            val t = next(p).get(c); t != null && t.intValue() == q
          }) {
            next(p).put(c, clone)
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      ai += 1
    }

    var v = 0
    var l = 0
    var best = 0
    var bestEnd = -1
    var q = 0
    while (q < b.length) {
      val c: Integer = b(q)
      if (next(v).containsKey(c)) {
        v = next(v).get(c).intValue()
        l += 1
      } else {
        while (v != -1 && !next(v).containsKey(c)) v = link(v)
        if (v == -1) { v = 0; l = 0 }
        else {
          l = len(v) + 1
          v = next(v).get(c).intValue()
        }
      }
      if (l > best) { best = l; bestEnd = q }
      q += 1
    }
    val start = if (best == 0) 0L else (bestEnd - best + 2).toLong // 1-based
    new GenericInternalRow(Array[Any](best.toLong, start))
  }

  /** Column API: `lcs(a, b)` → struct<len, b_start>. */
  def lcs(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(LcsExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
