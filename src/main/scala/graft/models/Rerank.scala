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

  /** Calibrated re-ranking (Steck, RecSys 2018 "Calibrated
    * Recommendations" §5): greedy list construction — step t picks
    *
    *   argmax_i  (1−λ)·rel_i − λ·C_KL( p_u ‖ q̃(selected ∪ {i}) )
    *
    * where p_u is the user's HISTORY category distribution, q the
    * category distribution of the list so far plus the candidate, and
    * q̃ = (1−α)·q + α·p the paper's smoothing. The marginal Σrel over
    * already-selected items is constant within a step, so rel_i alone
    * carries the relevance half.
    *
    * Portability: each per-category KL term is floor-quantized to ppt
    * BEFORE the per-candidate sum (float sums are partition-order
    * dependent; the quantized sums are exact integers — the documented
    * deviation from the paper's pure-float greedy), the final score
    * rounds to 9 decimals, ties break by item ascending. Candidates and
    * history items without a category row are dropped (the category
    * table's coverage is the caller's contract).
    *
    * SHAPE (the [[mmr]] discipline): a driver loop of exactly k steps;
    * each step one anti-join, one bounded fan-out join (candidates ×
    * the user's history categories), one left join on the running
    * selected-category counts, one aggregation, one per-query top-1 crop.
    *
    * Returns (query, item, cal_score, position 1..k). */
  def calibrated(recs: DataFrame, history: DataFrame, itemCats: DataFrame,
      k: Int, lambda: Double = 0.5, alpha: Double = 0.01,
      queryCol: String = "query_id", itemCol: String = "item_id",
      ratingCol: String = "rating"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val cats = itemCats.select(F.col(itemCol), F.col("category"))
    val p = history.select(queryCol, itemCol).distinct()
      .join(cats, Seq(itemCol))
      .groupBy(queryCol, "category")
      .agg(F.count(F.lit(1)).as("hc"))
    val pTot = p.groupBy(queryCol).agg(F.sum("hc").as("ht"))
    val pDist = p.join(pTot, Seq(queryCol))
    // r14 (guide §2.4 remove shuffles outright): the candidate × history-
    // category fan-out join is STEP-INVARIANT — only the anti-join against
    // the selected pairs changes per greedy step, and dropping (query, item)
    // pairs commutes with the per-query category fan-out. Join once, cache
    // the enriched pool, and run each step's anti-join on it: k joins of
    // pool×pDist collapse to one (plan: 3 per-step fan-out joins → 1).
    val poolDist = recs.select(queryCol, itemCol, ratingCol)
      .join(cats, Seq(itemCol))
      .join(pDist.select(F.col(queryCol),
        F.col("category").as("_pc"), F.col("hc"), F.col("ht")), Seq(queryCol))
      .cache()
    val w = Window.partitionBy(queryCol)
      .orderBy(F.col("_cal").desc, F.col(itemCol).asc)
    var selected: DataFrame = null
    var selCnt: DataFrame = null
    val picks = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var t = 1
    while (t <= k) {
      val joined =
        if (selected == null) poolDist
        else poolDist.join(selected.select(queryCol, itemCol),
          Seq(queryCol, itemCol), "left_anti")
      val withCnt =
        if (selCnt == null) joined.withColumn("_cnt", F.lit(null).cast("long"))
        else joined.join(selCnt.select(F.col(queryCol),
          F.col("category").as("_pc"), F.col("_cnt")),
          Seq(queryCol, "_pc"), "left")
      val kl = withCnt
        .withColumn("_term_ppt", F.expr(
          s"""CAST(floor((CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)) * ln(
             |  (CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)) /
             |  ((1.0 - CAST($alpha AS DOUBLE)) *
             |     (CAST(coalesce(_cnt, 0) +
             |        CASE WHEN _pc = category THEN 1 ELSE 0 END AS DOUBLE)
             |      / CAST($t AS DOUBLE))
             |   + CAST($alpha AS DOUBLE) *
             |     (CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)))
             |) * 1000000000000.0) AS BIGINT)""".stripMargin))
        .groupBy(queryCol, itemCol, ratingCol, "category")
        .agg(F.sum("_term_ppt").as("_kl_ppt"))
      val pick = kl
        .withColumn("_cal", F.round(
          F.lit(1.0 - lambda) * F.col(ratingCol) -
            F.lit(lambda) *
              (F.col("_kl_ppt").cast("double") / F.lit(1.0e12)), 9))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") === 1)
        .select(F.col(queryCol), F.col(itemCol), F.col("category"),
          F.col("_cal").as("cal_score"), F.lit(t.toLong).as("position"))
        .cache()
      pick.count() // materialize: step t+1's lineage must not recompute t
      picks += pick
      selected = if (selected == null) pick else selected.unionByName(pick)
      selCnt = selected.groupBy(queryCol, "category")
        .agg(F.count(F.lit(1)).as("_cnt"))
      t += 1
    }
    // release the k+2 cached frames before returning (ADVICE r12: a
    // library caller invoking calibrated repeatedly accumulated cached
    // blocks until executor storage pressure). The returned frame is
    // localCheckpoint'ed FIRST — k·|queries| rows, executor-resident — so
    // severing the lineage makes the unpersists safe (no recompute of the
    // greedy steps on a later action).
    val out = selected.select(queryCol, itemCol, "cal_score", "position")
      .localCheckpoint()
    picks.foreach(_.unpersist())
    poolDist.unpersist()
    out
  }
}
