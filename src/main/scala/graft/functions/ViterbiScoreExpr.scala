package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Best-segmentation (Viterbi) score over a per-row lattice — the
  * E-step scorer of a unigram-LM tokenizer (Kudo, ACL 2018; the
  * SentencePiece unigram model): given the word's lattice edges
  * (j, i, logp) — "the substring [j, i) is a vocabulary token with
  * log-probability logp" — returns max over segmentations of the
  * summed token log-probability, i.e. the DP
  *
  *   best(0) = 0;  best(i) = max over edges (j, i, lp) of best(j) + lp
  *
  * evaluated in one O(len · edges-per-position) in-row pass. NULL when
  * position `len` is unreachable (some character has no vocabulary
  * token covering it).
  *
  * Why an expression: the lattice is ROW-LOCAL and tiny (≤ maxWordLen ·
  * maxTokenLen edges), but the DP is sequential in i — relationally
  * that is maxWordLen chained joins (the shape the DuckDB oracle
  * replays as unrolled materialized CTEs); in-row it is a loop that
  * stays inside whole-stage codegen next to the collect_list that
  * built the lattice. */
case class ViterbiScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fields.length == 3 &&
          st.fields(0).dataType == IntegerType &&
          st.fields(1).dataType == IntegerType &&
          st.fields(2).dataType == DoubleType
      case _ => false
    }
    if (ok && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_viterbi_score requires (array<struct<j int, i int, " +
          s"lp double>>, int), got ${left.dataType.simpleString}, " +
          right.dataType.simpleString)
  }

  override def nullSafeEval(edges: Any, len: Any): Any =
    ViterbiScoreExpr.compute(
      edges.asInstanceOf[ArrayData], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = "graft.functions.ViterbiScoreExpr"
    nullSafeCodeGen(ctx, ev, (e, l) => {
      val r = ctx.freshName("vit")
      s"""Object $r = $fn.compute($e, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ViterbiScoreExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_viterbi_score"
}

/** Best-segmentation score AND minimal token count — the
  * [[ViterbiScoreExpr]] DP carrying a second array: among all
  * max-score segmentations, the fewest tokens (the deterministic
  * tie-break a fertility rollup needs; ties in score are REAL when
  * several substrings share a frequency). Returns
  * struct<s double, n int>, null when unreachable. The SQL oracle
  * replays the same two-level recurrence (max score, then min count
  * over score-achieving edges) with bit-identical double comparisons,
  * so the tie-break agrees across engines. */
case class ViterbiStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ViterbiScoreExpr.StatsType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ViterbiScoreExpr(left, right).checkInputDataTypes()

  override def nullSafeEval(edges: Any, len: Any): Any =
    ViterbiScoreExpr.computeStats(
      edges.asInstanceOf[ArrayData], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = "graft.functions.ViterbiScoreExpr"
    nullSafeCodeGen(ctx, ev, (e, l) => {
      val r = ctx.freshName("vitStats")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
         |  $fn.computeStats($e, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ViterbiStatsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_viterbi_stats"
}

/** The argmax segmentation itself — the token spans of the
  * [[ViterbiStatsExpr]] optimum, which is what an EM M-step counts.
  * Tie-break is TOTAL and replayable: maximize score, then fewest
  * tokens, then at every backtrace position take the achieving edge
  * with the SMALLEST start j (given the two DP arrays, each backtrace
  * choice is an independent argmin, so the same rule replays as
  * unrolled SQL). Returns array<struct<j int, i int>> of spans in word
  * order; null when no full segmentation exists. */
case class ViterbiPathExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ViterbiScoreExpr.PathType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ViterbiScoreExpr(left, right).checkInputDataTypes()

  override def nullSafeEval(edges: Any, len: Any): Any =
    ViterbiScoreExpr.computePath(
      edges.asInstanceOf[ArrayData], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = "graft.functions.ViterbiScoreExpr"
    nullSafeCodeGen(ctx, ev, (e, l) => {
      val r = ctx.freshName("vitPath")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $fn.computePath($e, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ViterbiPathExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_viterbi_path"
}

object ViterbiScoreExpr {

  val StatsType: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("s", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("n", IntegerType, nullable = false)))

  val PathType: ArrayType = ArrayType(
    StructType(Seq(
      org.apache.spark.sql.types.StructField("j", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("i", IntegerType, nullable = false))),
    containsNull = false)

  /** Backtrace of the (max score, fewest tokens) optimum with the
    * min-start-j tie rule at every step. Runs the two-array DP of
    * [[computeStats]], then walks back from `len`. */
  def computePath(edges: ArrayData, len: Int): ArrayData = {
    if (len < 0) return null
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val n = edges.numElements()
    val best = new Array[Double](len + 1)
    val ntok = new Array[Int](len + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    java.util.Arrays.fill(ntok, Int.MaxValue)
    best(0) = 0.0
    ntok(0) = 0
    var i = 1
    while (i <= len) {
      var e = 0
      while (e < n) {
        val row = edges.getStruct(e, 3)
        if (row.getInt(1) == i) {
          val j = row.getInt(0)
          if (j >= 0 && j < i && best(j) != Double.NegativeInfinity) {
            val cand = best(j) + row.getDouble(2)
            if (cand > best(i)) { best(i) = cand; ntok(i) = ntok(j) + 1 }
            else if (cand == best(i) && ntok(j) + 1 < ntok(i))
              ntok(i) = ntok(j) + 1
          }
        }
        e += 1
      }
      i += 1
    }
    if (best(len) == Double.NegativeInfinity) return null
    val spans = new java.util.ArrayList[Any](ntok(len))
    var pos = len
    while (pos > 0) {
      // the achieving edge with the smallest start j
      var bestJ = -1
      var e = 0
      while (e < n) {
        val row = edges.getStruct(e, 3)
        if (row.getInt(1) == pos) {
          val j = row.getInt(0)
          if (j >= 0 && j < pos && best(j) != Double.NegativeInfinity &&
            best(j) + row.getDouble(2) == best(pos) &&
            ntok(j) + 1 == ntok(pos) && (bestJ == -1 || j < bestJ))
            bestJ = j
        }
        e += 1
      }
      val row = new GenericInternalRow(2)
      row.update(0, bestJ)
      row.update(1, pos)
      spans.add(row)
      pos = bestJ
    }
    java.util.Collections.reverse(spans)
    new GenericArrayData(spans.toArray)
  }

  /** Two-array DP: best(i) = max score; ntok(i) = min token count among
    * edges ACHIEVING best(i) (double equality — both engines compute
    * the same candidate values, so the tie set agrees bit-for-bit).
    * Returns null when position len is unreachable. */
  def computeStats(edges: ArrayData, len: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    if (len < 0) return null
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (len == 0) { out.update(0, 0.0); out.update(1, 0); return out }
    val n = edges.numElements()
    val best = new Array[Double](len + 1)
    val ntok = new Array[Int](len + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    java.util.Arrays.fill(ntok, Int.MaxValue)
    best(0) = 0.0
    ntok(0) = 0
    var i = 1
    while (i <= len) {
      var e = 0
      while (e < n) {
        val row = edges.getStruct(e, 3)
        if (row.getInt(1) == i) {
          val j = row.getInt(0)
          if (j >= 0 && j < i && best(j) != Double.NegativeInfinity) {
            val cand = best(j) + row.getDouble(2)
            if (cand > best(i)) { best(i) = cand; ntok(i) = ntok(j) + 1 }
            else if (cand == best(i) && ntok(j) + 1 < ntok(i))
              ntok(i) = ntok(j) + 1
          }
        }
        e += 1
      }
      i += 1
    }
    if (best(len) == Double.NegativeInfinity) null
    else { out.update(0, best(len)); out.update(1, ntok(len)); out }
  }

  /** DP over the row's lattice. Edge arrays are tiny, so the O(E)
    * sweep per position (E = numElements) needs no bucketing. Returns
    * null (boxed) when best(len) is unreachable. */
  def compute(edges: ArrayData, len: Int): java.lang.Double = {
    if (len < 0) return null
    if (len == 0) return java.lang.Double.valueOf(0.0)
    val n = edges.numElements()
    val best = new Array[Double](len + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= len) {
      var e = 0
      while (e < n) {
        val row = edges.getStruct(e, 3)
        if (row.getInt(1) == i) {
          val j = row.getInt(0)
          if (j >= 0 && j < i && best(j) != Double.NegativeInfinity) {
            val cand = best(j) + row.getDouble(2)
            if (cand > best(i)) best(i) = cand
          }
        }
        e += 1
      }
      i += 1
    }
    if (best(len) == Double.NegativeInfinity) null
    else java.lang.Double.valueOf(best(len))
  }

  /** Column API: best-segmentation log-probability, null if no full
    * segmentation exists. */
  def score(edges: Column, len: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ViterbiScoreExpr(
      ColumnBridge.expression(edges),
      ColumnBridge.expression(len.cast("int"))))
  }

  /** Column API: struct<s, n> — best score and the minimal token count
    * among max-score segmentations; null if unreachable. */
  def stats(edges: Column, len: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ViterbiStatsExpr(
      ColumnBridge.expression(edges),
      ColumnBridge.expression(len.cast("int"))))
  }

  /** Column API: array<struct<j, i>> — the argmax segmentation's token
    * spans under the (score, fewest-tokens, min-j) total tie rule;
    * null if unreachable. */
  def path(edges: Column, len: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ViterbiPathExpr(
      ColumnBridge.expression(edges),
      ColumnBridge.expression(len.cast("int"))))
  }
}
