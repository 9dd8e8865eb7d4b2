package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Per-group DISCORDANT-pair count for Kendall's τ — Knight's
  * O(m log m) merge-sort inversion count (Knight, JASA 1966; the
  * scipy.stats.kendalltau formulation) as a first-class Catalyst
  * aggregate: sort the group's (x, y) pairs by (x asc, y asc), then
  * count STRICT y-inversions — pairs with x_i < x_j and y_i > y_j
  * (x-ties contribute none because y ascends within an x-run; y-ties
  * are not strict inversions). This is the per-cell kernel of
  * [[graft.ops.Kendall.tauBExactDistributed]]'s grid decomposition —
  * each grid group is O(n/B), so the whole-table discordant count is
  * O(n log n) total across bounded-size tasks instead of the O(n²)
  * pair join.
  *
  * Buffer contract: the group's pairs are HELD (two doubles per row)
  * until eval — memory is 16 bytes × group size, which is why the
  * caller guards group sizes (`maxGroup`) before aggregating, the same
  * require-before-work discipline as `Transitions.stationary`. Merge
  * concatenates (counting cross-buffer inversions exactly would need
  * an order-statistics merge; concat keeps the aggregate simple and
  * the asymptotics unchanged). Null/NaN x or y rows are skipped —
  * callers pre-filter, this is belt-and-braces. */
case class DiscordantPairs(
    x: Expression, y: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_discordant_pairs"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val xd = xv.asInstanceOf[Double]
      val yd = yv.asInstanceOf[Double]
      if (!xd.isNaN && !yd.isNaN) buf += ((xd, yd))
    }
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[(Double, Double)],
      b2: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    b1 ++= b2
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val sorted = buf.sortBy(identity).toArray // (x asc, y asc)
    countStrictInversions(sorted.map(_._2))
  }

  /** Merge sort counting strict inversions (a(j) < a(i), i < j). */
  private def countStrictInversions(a: Array[Double]): Long = {
    val buf = new Array[Double](a.length)
    def sort(lo: Int, hi: Int): Long = { // [lo, hi)
      if (hi - lo < 2) return 0L
      val mid = (lo + hi) >>> 1
      var inv = sort(lo, mid) + sort(mid, hi)
      var i = lo; var j = mid; var k = lo
      while (i < mid && j < hi) {
        if (a(j) < a(i)) { inv += mid - i; buf(k) = a(j); j += 1 }
        else { buf(k) = a(i); i += 1 }
        k += 1
      }
      while (i < mid) { buf(k) = a(i); i += 1; k += 1 }
      while (j < hi) { buf(k) = a(j); j += 1; k += 1 }
      System.arraycopy(buf, lo, a, lo, hi - lo)
      inv
    }
    sort(0, a.length)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (a, b) => out.writeDouble(a); out.writeDouble(b) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DiscordantPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DiscordantPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DiscordantPairs =
    copy(x = newChildren(0), y = newChildren(1))
}

object DiscordantPairs {

  /** Column API: `discordant(x, y)` aggregates to the group's strict
    * discordant-pair count (Long). Inputs are cast to double. */
  def discordant(xCol: Column, yCol: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      DiscordantPairs(
        ColumnBridge.expression(xCol.cast("double")),
        ColumnBridge.expression(yCol.cast("double")))
        .toAggregateExpression())
  }
}
