package graft.metrics

import org.apache.spark.sql.{DataFrame, functions => F}

/** Offline policy evaluation over a logged bandit replay — the engine's
  * end-to-end OBP-connector slice (reference:
  * replay/experimental/scenarios/obp_wrapper/replay_offline.py:62-210 and
  * examples/obp_connector/run_synt.py): a target policy's action
  * distribution (any model's `predictProba`) is scored against logged
  * (action, reward, behavior-propensity) rounds with the standard
  * importance-sampling estimators:
  *
  *   IPS   V̂ = (1/n) Σ wᵢ·rᵢ,           wᵢ = π_e(aᵢ|xᵢ) / π_b(aᵢ|xᵢ)
  *   NCIS  V̂ = Σ ŵᵢ·rᵢ / Σ ŵᵢ,          ŵᵢ = min(wᵢ, clip)
  *
  * (NCIS = clipped, self-normalized IS — the same weight-normalized
  * estimator family as [[Kernels.ncisPrecision]], applied to policy VALUE
  * instead of ranking precision; Swaminathan & Joachims 2015.)
  *
  * Scale: two equi-joins on the action key plus one global aggregation —
  * no window, no driver state; the logged replay and both policy frames
  * stream through one shuffle each. */
object Ope {
  /** One-row estimate: (n, behavior_value, ips_value, ncis_value), 6dp.
    *
    * `logged`: (query_id, item_id, reward) — one row per logged round.
    * `targetProba`: (query_id, item_id, prob) — π_e of the logged action
    * (a `predictProba` output at position 0).
    * `behavior`: (item_id[, query_id], propensity) — π_b of the logged
    * action; rounds whose action has no target or behavior support drop
    * (inner joins — the standard common-support restriction). */
  def estimate(logged: DataFrame, targetProba: DataFrame, behavior: DataFrame,
      clip: Double = 10.0): DataFrame =
    value(summary(logged, targetProba, behavior, clip))

  /** Mergeable OPE sufficient statistics — ONE row
    * (n, sum_r, sum_wr, sum_wc, sum_wcr): everything [[value]] needs is a
    * sum, so the estimators maintain incrementally exactly like
    * Ops.aggSummary/aggMerge — summarize only today's logged rounds and
    * [[merge]] into yesterday's state; the replay history is never
    * re-scanned, and a streaming job can fold micro-batch summaries into
    * a running policy-value monitor. */
  def summary(logged: DataFrame, targetProba: DataFrame, behavior: DataFrame,
      clip: Double = 10.0): DataFrame = {
    require(clip > 0, s"Ope.summary: clip=$clip")
    val behKeys = Seq("query_id", "item_id").filter(behavior.columns.contains)
    logged
      .join(targetProba.select("query_id", "item_id", "prob"),
        Seq("query_id", "item_id"))
      .join(behavior, behKeys)
      .withColumn("_w", F.col("prob") / F.col("propensity"))
      .withColumn("_wc", F.least(F.col("_w"), F.lit(clip)))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum("reward").as("sum_r"),
        F.sum(F.col("_w") * F.col("reward")).as("sum_wr"),
        F.sum("_wc").as("sum_wc"),
        F.sum(F.col("_wc") * F.col("reward")).as("sum_wcr"))
  }

  /** Merge [[summary]] states: pure cell-wise addition —
    * `value(merge(summary(A), summary(B)))` estimates A ∪ B. */
  def merge(summaries: DataFrame*): DataFrame = {
    require(summaries.nonEmpty, "Ope.merge: need at least one summary")
    summaries.reduce(_ unionAll _).agg(
      F.sum("n").as("n"), F.sum("sum_r").as("sum_r"),
      F.sum("sum_wr").as("sum_wr"), F.sum("sum_wc").as("sum_wc"),
      F.sum("sum_wcr").as("sum_wcr"))
  }

  /** Finalize a [[summary]]/[[merge]] state into the estimator row. */
  def value(summary: DataFrame): DataFrame =
    summary.select(
      F.col("n"),
      F.round(F.col("sum_r") / F.col("n"), 6).as("behavior_value"),
      F.round(F.col("sum_wr") / F.col("n"), 6).as("ips_value"),
      F.round(F.col("sum_wcr") / F.col("sum_wc"), 6).as("ncis_value"))

  // ------------------------------------------------------------------
  // Direct Method + Doubly Robust (round 12) — the rest of the standard
  // OBP estimator trio (reference obp wrapper replay_offline.py:62-210;
  // formulas: Dudík, Langford & Li 2011):
  //
  //   DM  V̂ = (1/n) Σᵢ q̂(xᵢ, π_e),  q̂(x, π_e) = Σ_a π_e(a|x)·r̂(a, x)
  //   DR  V̂ = V̂_DM + (1/n) Σᵢ wᵢ·(rᵢ − r̂(aᵢ, xᵢ))
  //
  // emitted with both the plain-w correction (OBP's default, lambda=∞)
  // and the clipped-ŵ correction (ŵ = min(w, clip), the NCIS clip).
  // ------------------------------------------------------------------

  /** Mergeable DM/DR sufficient statistics — ONE row extending [[summary]]
    * with (sum_dm, sum_wrhat, sum_wcrhat): still pure sums, so the same
    * incremental/streaming maintenance applies.
    *
    * `actionDist`: (query_id, item_id, prob) — π_e over the FULL action
    * support per logged query (a `predictProba` position-0 slice), used
    * only for the DM expectation. `rewardModel`: (item_id[, query_id],
    * r_hat) — the reward regression q̂; actions it can't score contribute
    * r̂ = 0 (the estimator stays consistent for any baseline).
    *
    * Scale: rewardModel is broadcast (catalog-bounded); the DM expectation
    * is one shuffle of actionDist on the query key; everything else is the
    * [[summary]] join chain. */
  def drSummary(logged: DataFrame, targetProba: DataFrame, behavior: DataFrame,
      actionDist: DataFrame, rewardModel: DataFrame,
      clip: Double = 10.0): DataFrame = {
    require(clip > 0, s"Ope.drSummary: clip=$clip")
    val behKeys = Seq("query_id", "item_id").filter(behavior.columns.contains)
    val rKeys = Seq("query_id", "item_id").filter(rewardModel.columns.contains)
    val rm = rewardModel.select((rKeys.map(F.col) :+ F.col("r_hat")): _*)
    // q̂(x, π_e): per-query expectation of r̂ under the target policy
    val dmq = actionDist.select("query_id", "item_id", "prob")
      .join(F.broadcast(rm), rKeys)
      .groupBy("query_id")
      .agg(F.sum(F.col("prob") * F.col("r_hat")).as("_dmq"))
    logged
      .join(targetProba.select("query_id", "item_id", "prob"),
        Seq("query_id", "item_id"))
      .join(behavior, behKeys)
      .join(F.broadcast(rm), rKeys, "left")
      .join(dmq, Seq("query_id"), "left")
      .withColumn("_rh", F.coalesce(F.col("r_hat"), F.lit(0.0)))
      .withColumn("_w", F.col("prob") / F.col("propensity"))
      .withColumn("_wc", F.least(F.col("_w"), F.lit(clip)))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum("reward").as("sum_r"),
        F.sum(F.col("_w") * F.col("reward")).as("sum_wr"),
        F.sum("_wc").as("sum_wc"),
        F.sum(F.col("_wc") * F.col("reward")).as("sum_wcr"),
        F.sum(F.coalesce(F.col("_dmq"), F.lit(0.0))).as("sum_dm"),
        F.sum(F.col("_w") * F.col("_rh")).as("sum_wrhat"),
        F.sum(F.col("_wc") * F.col("_rh")).as("sum_wcrhat"))
  }

  /** Merge [[drSummary]] states: cell-wise addition, like [[merge]]. */
  def drMerge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "Ope.drMerge: need at least one state")
    states.reduce(_ unionAll _).agg(
      F.sum("n").as("n"), F.sum("sum_r").as("sum_r"),
      F.sum("sum_wr").as("sum_wr"), F.sum("sum_wc").as("sum_wc"),
      F.sum("sum_wcr").as("sum_wcr"), F.sum("sum_dm").as("sum_dm"),
      F.sum("sum_wrhat").as("sum_wrhat"), F.sum("sum_wcrhat").as("sum_wcrhat"))
  }

  /** Finalize a [[drSummary]]/[[drMerge]] state: the full estimator row —
    * behavior/IPS/NCIS plus dm_value, dr_value (plain-w correction) and
    * dr_clipped_value (clipped-ŵ correction). */
  def drValue(state: DataFrame): DataFrame =
    state.select(
      F.col("n"),
      F.round(F.col("sum_r") / F.col("n"), 6).as("behavior_value"),
      F.round(F.col("sum_wr") / F.col("n"), 6).as("ips_value"),
      F.round(F.col("sum_wcr") / F.col("sum_wc"), 6).as("ncis_value"),
      F.round(F.col("sum_dm") / F.col("n"), 6).as("dm_value"),
      F.round((F.col("sum_dm") + F.col("sum_wr") - F.col("sum_wrhat"))
        / F.col("n"), 6).as("dr_value"),
      F.round((F.col("sum_dm") + F.col("sum_wcr") - F.col("sum_wcrhat"))
        / F.col("n"), 6).as("dr_clipped_value"))

  /** One-row DM/DR estimate — see [[drSummary]] for the frame contracts. */
  def estimateDr(logged: DataFrame, targetProba: DataFrame, behavior: DataFrame,
      actionDist: DataFrame, rewardModel: DataFrame,
      clip: Double = 10.0): DataFrame =
    drValue(drSummary(logged, targetProba, behavior, actionDist, rewardModel, clip))
}
