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

  /** Typed-Aggregator face of [[graft.core.TopKHeap]] (one comparison +
    * zero allocation for a row that misses the cut; O(log k) in-place sift
    * for one that makes it). The heap object is the aggregation buffer —
    * kryo-serialized only at shuffle boundaries, held as a plain object in
    * the ObjectHashAggregate map. The huge-stream crop path uses the
    * native TypedImperativeAggregate twin (core.BoundedTopKAgg) instead,
    * which also skips this wrapper's per-row encoder conversion. */
  sealed abstract class BoundedTopK[OUT](k: Int)
      extends Aggregator[Pair, graft.core.TopKHeap, OUT] {
    def zero: graft.core.TopKHeap = new graft.core.TopKHeap(k)
    def reduce(b: graft.core.TopKHeap, a: Pair): graft.core.TopKHeap = {
      b.insert(a._1, a._2); b
    }
    def merge(b1: graft.core.TopKHeap, b2: graft.core.TopKHeap): graft.core.TopKHeap = {
      b1.mergeFrom(b2); b1
    }
    def bufferEncoder: Encoder[graft.core.TopKHeap] =
      Encoders.kryo[graft.core.TopKHeap]
  }

  final class TopKAggregator(k: Int) extends BoundedTopK[Seq[Long]](k) {
    def finish(b: graft.core.TopKHeap): Seq[Long] = b.sortedPairs.map(_._2).toSeq
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** (rating, item) pairs variant. */
  final class TopKPairsAggregator(k: Int) extends BoundedTopK[Seq[Pair]](k) {
    def finish(b: graft.core.TopKHeap): Seq[Pair] = b.sortedPairs.toSeq
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
