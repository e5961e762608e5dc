package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Recommendation-list post-processors (engine extras — the reference
  * emits raw top-k lists; production rerankers sit between predict and
  * serving).
  */
object Rerank {
  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
    * greedy diversity re-ranking of a per-query candidate pool —
    *
    *   score_i(t) = λ·rel_i − (1−λ)·max_{s ∈ selected} sim(i, s)
    *
    * with the max over the empty set = 0 (step 1 picks pure relevance).
    * `sim` is a sparse cropped similarity table (item_one, item_two,
    * similarity) — e.g. a fitted NeighbourRec's state; absent pairs count
    * as 0 similarity. Scores round to 9 decimals before ranking (the
    * NeighbourRec tie discipline), ties by item ascending.
    *
    * SHAPE: a driver loop of exactly k steps — k is the OUTPUT list size,
    * small by contract — each step one anti-join (drop selected), one
    * bounded fan-out join (candidates × ≤t−1 selected), one left join on
    * the cropped sim table, one max-aggregate, one per-query top-1 crop
    * (WindowGroupLimit). Per-query state never exceeds the pool size, so
    * the loop is k·O(pool) distributed work with no driver data motion.
    *
    * Returns (query, item, mmr, position 1..k).
    */
  def mmr(recs: DataFrame, sim: DataFrame, k: Int, lambda: Double = 0.5,
      queryCol: String = "query_id", itemCol: String = "item_id",
      ratingCol: String = "rating"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val pool = recs.select(queryCol, itemCol, ratingCol).cache()
    val w = Window.partitionBy(queryCol)
      .orderBy(F.col("_mmr").desc, F.col(itemCol).asc)
    var selected: DataFrame = null
    var t = 1
    while (t <= k) {
      val cand =
        if (selected == null) pool
        else pool.join(selected.select(queryCol, itemCol),
          Seq(queryCol, itemCol), "left_anti")
      val pen =
        if (selected == null) cand.withColumn("_pen", F.lit(0.0))
        else cand
          .join(selected.select(F.col(queryCol), F.col(itemCol).as("_sel")),
            Seq(queryCol))
          .join(sim, F.col(itemCol) === F.col("item_one") &&
            F.col("_sel") === F.col("item_two"), "left")
          .groupBy(queryCol, itemCol, ratingCol)
          .agg(F.max(F.coalesce(F.col("similarity"), F.lit(0.0))).as("_pen"))
      val pick = pen
        .withColumn("_mmr", F.round(
          F.lit(lambda) * F.col(ratingCol) -
            F.lit(1.0 - lambda) * F.col("_pen"), 9))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") === 1)
        .select(F.col(queryCol), F.col(itemCol), F.col("_mmr").as("mmr"),
          F.lit(t.toLong).as("position"))
        .cache()
      pick.count() // materialize: step t+1's lineage must not recompute t
      selected = if (selected == null) pick else selected.unionByName(pick)
      t += 1
    }
    selected
  }
}
