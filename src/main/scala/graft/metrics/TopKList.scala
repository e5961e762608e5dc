package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k aggregation.
  *
  * `sort_array(collect_list(struct(...)))` (the reference's enrichment op,
  * base_metric.py:195-214) buffers a user's ENTIRE history before sorting —
  * unbounded per-group state, which at 100 TB means one power-law user can
  * spill or OOM an executor. This `Aggregator` keeps only the running
  * top-k (rating desc, item asc) per group: O(k) state, associative merge,
  * partial aggregation (map-side combine) for free. SURVEY §7.3's
  * "custom Aggregator" item.
  */
object TopKList {
  type Pair = (Double, Long) // (rating, item)

  /** Bounded binary min-heap over PRIMITIVE arrays: the root is the worst
    * kept element under the (rating desc, item asc) total order, so on a
    * big scored stream the common case — a row that misses the cut — is
    * rejected with one comparison and ZERO allocation, and an accepted row
    * is an in-place O(log k) sift. (A first cut used an immutable sorted
    * List: the `:::` splicing allocated O(k) cells per accepted insert,
    * which at k≈200 over a 300M-row stream was GC-bound and slower than
    * the sort it replaced.) */
  final case class Buf(var ratings: Array[Double], var items: Array[Long], var n: Int)

  sealed abstract class BoundedTopK[OUT](k: Int) extends Aggregator[Pair, Buf, OUT] {
    /** true when (r1, i1) ranks better than (r2, i2). */
    @inline private def better(r1: Double, i1: Long, r2: Double, i2: Long): Boolean =
      r1 > r2 || (r1 == r2 && i1 < i2)

    private def siftDown(b: Buf, start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i // index of the worst among i and its children
        if (l < b.n && better(b.ratings(w), b.items(w), b.ratings(l), b.items(l))) w = l
        if (r < b.n && better(b.ratings(w), b.items(w), b.ratings(r), b.items(r))) w = r
        if (w == i) return
        val tr = b.ratings(i); b.ratings(i) = b.ratings(w); b.ratings(w) = tr
        val ti = b.items(i); b.items(i) = b.items(w); b.items(w) = ti
        i = w
      }
    }

    private def siftUp(b: Buf, start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        // parent must be WORSE-or-equal than child; stop when it already is
        if (!better(b.ratings(p), b.items(p), b.ratings(i), b.items(i))) return
        val tr = b.ratings(i); b.ratings(i) = b.ratings(p); b.ratings(p) = tr
        val ti = b.items(i); b.items(i) = b.items(p); b.items(p) = ti
        i = p
      }
    }

    protected def insert(b: Buf, rating: Double, item: Long): Unit = {
      if (b.n < k) {
        if (b.ratings.length == 0) { // lazily sized (zero() must be cheap)
          val cap = k
          b.ratings = new Array[Double](cap); b.items = new Array[Long](cap)
        }
        b.ratings(b.n) = rating; b.items(b.n) = item; b.n += 1
        siftUp(b, b.n - 1)
      } else if (better(rating, item, b.ratings(0), b.items(0))) {
        b.ratings(0) = rating; b.items(0) = item
        siftDown(b, 0)
      }
    }

    def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray, 0)
    def reduce(b: Buf, a: Pair): Buf = { insert(b, a._1, a._2); b }
    def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b2.n) { insert(b1, b2.ratings(i), b2.items(i)); i += 1 }
      b1
    }

    /** Kept elements in best-first (rating desc, item asc) order. */
    protected def bestFirst(b: Buf): Seq[Pair] = {
      val pairs = new Array[Pair](b.n)
      var i = 0
      while (i < b.n) { pairs(i) = (b.ratings(i), b.items(i)); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        pairs.sortWith((a, c) => better(a._1, a._2, c._1, c._2)))
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  final class TopKAggregator(k: Int) extends BoundedTopK[Seq[Long]](k) {
    def finish(b: Buf): Seq[Long] = bestFirst(b).map(_._2)
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** (rating, item) pairs variant — the row-shaped twin Ops
    * .getTopKRecsBounded explodes back into (query, item, rating) rows. */
  final class TopKPairsAggregator(k: Int) extends BoundedTopK[Seq[Pair]](k) {
    def finish(b: Buf): Seq[Pair] = bestFirst(b)
    def outputEncoder: Encoder[Seq[Pair]] = ExpressionEncoder[Seq[Pair]]()
  }

  /** Column form for DataFrame groupBy: top-k item list per group. */
  def topKItems(k: Int, ratingCol: String, itemCol: String): Column =
    F.udaf(new TopKAggregator(k))
      .apply(F.col(ratingCol).cast("double"), F.col(itemCol).cast("bigint"))

  /** Column form keeping (rating, item) structs — see
    * Ops.getTopKRecsBounded. */
  def topKPairs(k: Int, ratingCol: String, itemCol: String): Column =
    F.udaf(new TopKPairsAggregator(k))
      .apply(F.col(ratingCol).cast("double"), F.col(itemCol).cast("bigint"))

  /** Drop-in enrichment twin of Metrics.enrich using the bounded
    * aggregator (only the top maxK predictions matter to any metric@k). */
  def enrichBounded(recs: DataFrame, groundTruth: DataFrame, maxK: Int,
      cols: graft.models.RecCols = graft.models.RecCols()): DataFrame = {
    val predLists = recs.groupBy(cols.query)
      .agg(topKItems(maxK, cols.rating, cols.item).as("pred"))
    val gtSets = groundTruth.groupBy(cols.query)
      .agg(F.collect_set(cols.item).as("gt"))
    gtSets.join(predLists, Seq(cols.query), "left")
      .withColumn("pred", F.coalesce(F.col("pred"), F.array()))
  }
}
