package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap over primitive arrays: root = worst kept element
  * under (rating desc, item asc). Shared by the native aggregate below and
  * by graft.metrics.TopKList's typed Aggregator twins. A row that misses
  * the cut costs one comparison and zero allocation; an accepted row is an
  * in-place O(log k) sift. */
final class TopKHeap(val k: Int) extends Serializable {
  var ratings: Array[Double] = Array.emptyDoubleArray
  var items: Array[Long] = Array.emptyLongArray
  var n: Int = 0

  @inline private def better(r1: Double, i1: Long, r2: Double, i2: Long): Boolean =
    r1 > r2 || (r1 == r2 && i1 < i2)

  private def ensure(): Unit =
    if (ratings.length == 0) { ratings = new Array[Double](k); items = new Array[Long](k) }

  private def swap(a: Int, b: Int): Unit = {
    val tr = ratings(a); ratings(a) = ratings(b); ratings(b) = tr
    val ti = items(a); items(a) = items(b); items(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && better(ratings(w), items(w), ratings(l), items(l))) w = l
      if (r < n && better(ratings(w), items(w), ratings(r), items(r))) w = r
      if (w == i) continue = false else { swap(i, w); i = w }
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (!better(ratings(p), items(p), ratings(i), items(i))) return
      swap(i, p); i = p
    }
  }

  def insert(rating: Double, item: Long): Unit =
    if (n < k) {
      ensure()
      ratings(n) = rating; items(n) = item; n += 1
      siftUp(n - 1)
    } else if (k > 0 && better(rating, item, ratings(0), items(0))) {
      ratings(0) = rating; items(0) = item
      siftDown(0)
    }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ratings(i), other.items(i)); i += 1 }
  }

  /** (rating, item) pairs in best-first order. */
  def sortedPairs: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (ratings(i), items(i)); i += 1 }
    out.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
  }
}

/** Native bounded top-k aggregate: the TypedImperativeAggregate twin of
  * TopKList's typed Aggregator. Reads (rating, item) straight off the
  * InternalRow — no encoder round-trip, no Tuple2 per row — which matters
  * when the input is a |queries| × |catalog| scored stream (300M rows at
  * sf0.1). Emits array<struct<rating double, item bigint>> in best-first
  * order. Null ratings/items are skipped (a null can never enter a rank
  * window's top-k under `rating desc` either). */
case class BoundedTopKAgg(
    k: Int,
    ratingExpr: Expression,
    itemExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(ratingExpr, itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rating", DoubleType, nullable = false),
    StructField("item", LongType, nullable = false))))
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val r = ratingExpr.eval(input)
    if (r != null) {
      val i = itemExpr.eval(input)
      if (i != null) buf.insert(r.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (r, i) =>
      InternalRow(r, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.ratings(i)); bb.putLong(buf.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(ratingExpr = newChildren(0), itemExpr = newChildren(1))
}

object BoundedTopKAgg {
  /** Column form: top-k (rating, item) struct list per group. */
  def topKPairs(k: Int, rating: Column, item: Column): Column =
    GraftExpressionBridge.column(
      BoundedTopKAgg(k,
        GraftExpressionBridge.expression(rating.cast("double")),
        GraftExpressionBridge.expression(item.cast("bigint"))
      ).toAggregateExpression())
}
