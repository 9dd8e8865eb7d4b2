package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate — the MERGEABLE heap the profiler's top-K
  * collection uses, exposed as a first-class Catalyst aggregate so any
  * groupBy can take "top k rows per group by (ord desc, id asc)"
  * WITHOUT a per-group window sort: partial buffers hold at most ~4k
  * entries each, merge is concatenate-and-compact, and the final value
  * is the sorted k-list as `array<struct<ord, id>>`.
  *
  * This is the scalable replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`:
  * the window shuffles and SORTS every group's full row set, while this
  * aggregate ships O(k) per partition per group — the same reason the
  * engine's value-counts top-K (`Profiler.topKPerColumn`) never sorts a
  * column's whole domain. Deterministic: order is (ord desc, id asc),
  * ties broken by the id.
  */
case class BoundedTopK(
    ord: Expression, id: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case n: Int  => require(n >= 1, "k must be >= 1"); n
    case n: Long => require(n >= 1, "k must be >= 1"); n.toInt
    case other => throw new IllegalArgumentException(
      s"graft_top_k: k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(ord, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  private def best(buf: mutable.ArrayBuffer[(Long, Long)], n: Int) =
    buf.sortBy { case (o, i) => (-o, i) }.take(n)

  private def compact(buf: mutable.ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val keep = best(buf, k)
      buf.clear()
      buf ++= keep
    }

  override def update(
      buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buf += ((o.asInstanceOf[Long], i.asInstanceOf[Long]))
      // amortized compaction: allow the buffer to grow a few multiples
      // of k between sorts instead of sorting per row
      if (buf.length >= 4 * k + 4) compact(buf)
    }
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[(Long, Long)],
      b2: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    compact(b1)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(best(buf, k).map { case (o, i) =>
      InternalRow(o, i)
    }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (o, i) => out.writeLong(o); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(ord = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object BoundedTopK {

  /** Column API: `topK(ord, id, k)` aggregates to the top-k
    * `array<struct<ord, id>>` by (ord desc, id asc). Inputs are cast
    * to long. */
  def topK(ordCol: Column, idCol: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BoundedTopK(
        ColumnBridge.expression(ordCol.cast("long")),
        ColumnBridge.expression(idCol.cast("long")),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
  }
}
