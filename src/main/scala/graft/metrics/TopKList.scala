package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k list aggregation.
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
  final case class Buf(var items: List[Pair])

  final class TopKAggregator(k: Int) extends Aggregator[Pair, Buf, Seq[Long]] {
    // order: rating desc, item asc — identical to Ops.getTopKRecs
    private def lt(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(sorted: List[Pair], p: Pair): List[Pair] = {
      val (before, after) = sorted.span(x => lt(x, p))
      val merged = before ::: p :: after
      if (merged.length > k) merged.take(k) else merged
    }

    def zero: Buf = Buf(Nil)
    def reduce(b: Buf, a: Pair): Buf = { b.items = insert(b.items, a); b }
    def merge(b1: Buf, b2: Buf): Buf = {
      b2.items.foreach(p => b1.items = insert(b1.items, p)); b1
    }
    def finish(b: Buf): Seq[Long] = b.items.map(_._2)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column form for DataFrame groupBy: top-k item list per group. */
  def topKItems(k: Int, ratingCol: String, itemCol: String): Column =
    F.udaf(new TopKAggregator(k))
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
