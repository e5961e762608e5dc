package graft.models

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.core.Ops
import graft.text.Similarity

/** Item-to-item similarity queries — the "similar items" carousel surface
  * (reference: `get_nearest_items` / `_get_nearest_items_wrap`,
  * replay/models/base_rec.py:631-777 and base_neighbour_rec.py:144-188).
  *
  * Two backing shapes:
  *  - a materialized similarity table (ItemKNN / SLIM / AssociationRules):
  *    the table is already cropped to ~numNeighbours rows per anchor item,
  *    so the query is two broadcast semi-joins plus a tiny per-anchor
  *    window — no shuffle of the full table.
  *  - item factor vectors (ALS / Word2Vec): score the anchor set against
  *    the (optionally candidate-restricted) catalog. The anchor set is the
  *    small side by use-case (a carousel asks for a handful of items), so
  *    it is broadcast and the catalog streams through ONE codegen dot
  *    product per pair into the bounded O(k) heap crop — no sort, no
  *    shuffle of |anchors|×|catalog| rows, scale-safe at any catalog size.
  *
  * Output (base_rec.py:662-664): `(item, neighbour_item_id, <rel>)` where
  * `<rel>` is the metric column name (or "similarity"), top-k per anchor
  * ordered by (rel DESC, neighbour id DESC) — the reference's exact
  * tie-break (base_rec.py:653-658).
  */
object NearestItems {

  /** Metrics for vector-backed models (base_rec.py:696-700); euclidean
    * similarity = 1/(1+distance) (spark_utils.py:634-641). */
  val vectorMetrics: Seq[String] =
    Seq("cosine_similarity", "dot_product", "euclidean_distance_sim")

  /** Reference top-k wrap (base_rec.py:649-664): rank by
    * (rel desc, item_two desc), keep k, rename. Used on the
    * similarity-table path where per-anchor groups are already
    * ≤numNeighbours rows (WindowGroupLimit keeps it a bounded crop). */
  private def topKWrap(pairs: DataFrame, itemCol: String, relCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy("item_one")
      .orderBy(F.col(relCol).desc, F.col("item_two").desc)
    pairs.withColumn("_rn", F.row_number().over(w))
      .filter(F.col("_rn") <= k)
      .select(F.col("item_one").as(itemCol),
        F.col("item_two").as("neighbour_item_id"), F.col(relCol))
  }

  /** Nearest items from a materialized `(item_one, item_two, <relCol>)`
    * similarity table (base_neighbour_rec.py:167-188). `items` (and
    * `candidates` if given) are deduplicated and broadcast — they are the
    * small side by construction. */
  def fromSimilarity(similarity: DataFrame, itemCol: String, items: DataFrame,
      k: Int, candidates: Option[DataFrame] = None,
      relCol: String = "similarity"): DataFrame = {
    val anchors = F.broadcast(
      items.select(F.col(itemCol).as("item_one")).distinct())
    val filtered = similarity.join(anchors, Seq("item_one"))
    val restricted = candidates.map { c =>
      filtered.join(
        F.broadcast(c.select(F.col(itemCol).as("item_two")).distinct()),
        Seq("item_two"))
    }.getOrElse(filtered)
    topKWrap(restricted.select("item_one", "item_two", relCol),
      itemCol, relCol, k)
  }

  /** Nearest items from an `(itemCol, vecCol)` item-vector frame
    * (base_rec.py:740-777). One codegen dot product per (anchor, catalog)
    * pair drives all three metrics: norms are precomputed per item, so
    * cosine = dot/(n1·n2) and euclidean_sim = 1/(1+√(n1²+n2²−2·dot))
    * need no second array traversal.
    *
    * The |anchors|×|catalog| scored stream is cropped by the bounded
    * O(k)-state heap aggregation, not a window sort; the reference's
    * (rel desc, id desc) tie-break is preserved through the heap's
    * (rating desc, item ASC) order by negating ids around the crop. */
  def fromVectors(vectors: DataFrame, itemCol: String, vecCol: String,
      items: DataFrame, k: Int, metric: String = "cosine_similarity",
      candidates: Option[DataFrame] = None): DataFrame = {
    require(vectorMetrics.contains(metric),
      s"metric must be one of ${vectorMetrics.mkString(", ")}: got $metric")
    val base = vectors.select(
      F.col(itemCol).cast("long").as(itemCol),
      F.col(vecCol).cast("array<double>").as("_vec"))
      .withColumn("_norm", F.sqrt(Similarity.dot(F.col("_vec"), F.col("_vec"))))

    val left = base
      .select(F.col(itemCol).as("item_one"), F.col("_vec").as("_v1"),
        F.col("_norm").as("_n1"))
      .join(F.broadcast(items.select(F.col(itemCol).cast("long")
        .as("item_one")).distinct()), Seq("item_one"))
    val right0 = base.select(F.col(itemCol).as("item_two"),
      F.col("_vec").as("_v2"), F.col("_norm").as("_n2"))
    val right = candidates.map(c => right0.join(
      c.select(F.col(itemCol).cast("long").as("item_two")).distinct(),
      Seq("item_two"), "left_semi")).getOrElse(right0)

    val dot = Similarity.dot(F.col("_v1"), F.col("_v2"))
    val rel: Column = metric match {
      case "dot_product"        => dot
      case "cosine_similarity"  => dot / (F.col("_n1") * F.col("_n2"))
      case "euclidean_distance_sim" =>
        // greatest(0, ·) clamps the tiny negative float residue when the
        // two vectors are (near-)identical, keeping sqrt NaN-free
        F.lit(1.0) / (F.lit(1.0) + F.sqrt(F.greatest(F.lit(0.0),
          F.col("_n1") * F.col("_n1") + F.col("_n2") * F.col("_n2") -
            F.lit(2.0) * dot)))
    }
    // zero-norm vectors make cosine 0/0 = NaN; the bounded heap's contract
    // is NaN-free input (Ops.getTopKRecsBounded), so rank them last
    val relSafe = F.nanvl(rel, F.lit(Double.NegativeInfinity))

    val pairs = F.broadcast(left)
      .join(right, F.col("item_one") =!= F.col("item_two"))
      .select(F.col("item_one"), (-F.col("item_two")).as("_neg"),
        relSafe.as(metric))
    Ops.getTopKRecsBounded(pairs, k, "item_one", "_neg", metric)
      .select(F.col("item_one").as(itemCol),
        (-F.col("_neg")).as("neighbour_item_id"), F.col(metric))
  }
}
