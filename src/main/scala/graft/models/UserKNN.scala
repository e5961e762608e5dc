package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.core.Ops

/** User-user cosine KNN (engine extra — the reference ships only the
  * item-based neighbour model, replay/models/knn.py:74-229; this is its
  * exact transpose, the other classic memory-based CF baseline).
  *
  * fit: binary user vectors over distinct (user, item) pairs, dot products
  * via a self-join on the ITEM key (user1 < user2 then symmetrized —
  * halves the shuffle, same discipline as ItemKNN), cosine with shrinkage
  * sim = dot / (‖u‖·‖v‖ + shrink), then a per-user top-`numNeighbours`
  * bounded crop. Unweighted sums are exact integer counts, so the
  * similarity needs no rounding before the crop (the ItemKNN rule).
  *
  * predict: score(u, i) = Σ_{v ∈ neighbours(u)} sim(u, v) · 1[(v, i) ∈
  * train] — one equi-join of the cropped neighbour table onto the train
  * pairs, one aggregation; candidates are automatically bounded to items
  * the neighbourhood consumed. Seen-filter and top-k ride the base path.
  *
  * Scale: the item self-join is the hazard (a catalog blockbuster with
  * 10⁶ consumers would contribute 10¹² pairs) — `maxItemAudience` caps
  * each item's contribution to a deterministic pseudo-random subset
  * before the join, the transpose of ItemKNN's maxUserHistory cap, and
  * the same NOTE applies: the SQL oracles assume the cap does not bind
  * on gate data. */
final class UserKNN(
    val numNeighbours: Int = 10,
    val shrink: Double = 0.0,
    val maxItemAudience: Int = 1000,
    cols: RecCols = RecCols(),
) extends BaseRecommender(cols) {
  /** (query_one, query_two, similarity) — top neighbours per query_one. */
  var similarity: DataFrame = _
  /** distinct (query, item) train pairs — the vectors scoring sums over. */
  var trainPairs: DataFrame = _

  protected def doFit(log: DataFrame): Unit = {
    val base = log.select(cols.query, cols.item).distinct().cache()
    // r13 (guide §2.4): `capped` feeds norms + both self-join sides — cache
    // once instead of re-running the audience-cap window three times.
    val capped = (if (maxItemAudience > 0) {
      val w = Window.partitionBy(cols.item).orderBy(
        F.xxhash64(F.col(cols.query), F.col(cols.item)),
        F.col(cols.query).asc)
      base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= maxItemAudience).drop("_rn")
    } else base).cache()

    val norms = capped.groupBy(cols.query)
      .agg(F.sqrt(F.count(F.lit(1)).cast("double")).as("_norm"))
    val l = capped.select(F.col(cols.item), F.col(cols.query).as("query_one"))
    val r = capped.select(F.col(cols.item), F.col(cols.query).as("query_two"))
    val dots = l.join(r, Seq(cols.item))
      .filter(F.col("query_one") < F.col("query_two"))
      .groupBy("query_one", "query_two")
      .agg(F.count(F.lit(1)).cast("double").as("_dot"))
    // r13 (guide §2.4): `half` feeds both symmetrization branches — cached
    // so the Gram join+aggregation runs once, released after the crop.
    val half = dots
      .join(norms.withColumnRenamed(cols.query, "query_one")
        .withColumnRenamed("_norm", "_n1"), Seq("query_one"))
      .join(norms.withColumnRenamed(cols.query, "query_two")
        .withColumnRenamed("_norm", "_n2"), Seq("query_two"))
      .select(F.col("query_one"), F.col("query_two"),
        (F.col("_dot") / (F.col("_n1") * F.col("_n2") + F.lit(shrink)))
          .as("similarity"))
      .cache()
    val sym = half.unionByName(half.select(
      F.col("query_two").as("query_one"), F.col("query_one").as("query_two"),
      F.col("similarity")))
    similarity = Ops.getTopKRecsBounded(sym, numNeighbours,
      "query_one", "query_two", "similarity").cache()
    similarity.count()
    half.unpersist()
    trainPairs = base
    trainPairs.count()
    if (capped ne base) capped.unpersist() // scratch; state = similarity+base
  }

  protected def score(queries: DataFrame, k: Int, maxSeen: Int,
      items: Option[DataFrame] = None): DataFrame = {
    val sims = similarity.join(
      queries.select(F.col(cols.query).as("query_one")).distinct(),
      Seq("query_one"), "left_semi")
    val hist = restrictItems(trainPairs, items)
      .withColumnRenamed(cols.query, "query_two")
    // round to 9 decimals before ranking: float sums are partition-order
    // dependent at the last ulp (the NeighbourRec discipline)
    sims.join(hist, Seq("query_two"))
      .groupBy(F.col("query_one").as(cols.query), F.col(cols.item))
      .agg(F.round(F.sum("similarity"), 9).as(cols.rating))
  }

  def predictPairs(pairs: DataFrame, log: DataFrame): DataFrame = {
    val scores = score(pairs.select(cols.query).distinct(), 0, 0)
    pairs.join(scores, Seq(cols.query, cols.item), "left")
      .withColumn(cols.rating, F.coalesce(F.col(cols.rating), F.lit(0.0)))
  }

  /** knn.py:32 search space, transposed: neighbourhood size. */
  override def searchBorders: Map[String, (Double, Double)] = Map(
    "num_neighbours" -> (1.0, 100.0))

  override def withParams(p: Map[String, Double]): UserKNN = new UserKNN(
    numNeighbours = p.get("num_neighbours").map(_.round.toInt)
      .getOrElse(numNeighbours),
    shrink, maxItemAudience, cols)
}
