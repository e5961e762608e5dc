package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Sampled ranking evaluation — the "99 sampled negatives" offline
  * protocol (Koren & Rendle, KDD 2020, "On Sampled Metrics for Item
  * Recommendation"; the evaluation loop popularized by the NCF paper).
  * Not in the reference (its metrics rank against the full catalog,
  * replay/metrics/offline_metrics.py) — added as an engine extra because
  * sampled evaluation is how large-catalog models are actually compared:
  * ranking every catalog item per user is exactly the cost this protocol
  * exists to avoid.
  *
  * Protocol, fully deterministic and oracle-replayable:
  *  - per evaluated user, `nNeg` negatives are drawn from the scored
  *    catalog EXCLUDING the user's train history and held-out positives,
  *    by the portable md5 chain ([[graft.core.PortableHash]] — the same
  *    recipe every seeded split/sample gate mirrors in DuckDB);
  *  - each held-out positive is ranked among {positive} ∪ negatives by
  *    (score DESC, item_id ASC) — integer scores, deterministic ties;
  *  - metrics are EXACT integer ppm (floor division): HR@k, MRR (each
  *    reciprocal floor-quantized to 1e6//rank before averaging — the
  *    documented quantization that makes the whole row hash-comparable),
  *    and mean rank.
  *
  * SCALE: the candidate stream is |users| × |catalog| minus seen — the
  * same embarrassingly parallel keyed stream as the weighted samplers
  * (no shuffle of the pair stream beyond the per-user rank crop, which
  * Spark lowers to WindowGroupLimit); the rank join then fans out only
  * nNeg rows per positive. Nothing driver-side, nothing quadratic in the
  * catalog per positive.
  */
object SampledEval {
  /** Train-side popularity scores: distinct-user count per item (exact
    * BIGINT — the deterministic default scorer for the sampled protocol). */
  def itemPopularity(train: DataFrame, queryCol: String = "query_id",
      itemCol: String = "item_id"): DataFrame =
    train.groupBy(itemCol).agg(F.countDistinct(queryCol).as("score"))

  /** One-row exact-integer summary: n_pairs, hr_at_k_ppm, mrr_ppm,
    * mean_rank_ppm. `scores` must carry (itemCol, score BIGINT) — the
    * catalog IS the scored item set. */
  def sampledRanking(
      gt: DataFrame,
      train: DataFrame,
      scores: DataFrame,
      nNeg: Int = 99,
      k: Int = 10,
      seed: Long = 99L,
      queryCol: String = "query_id",
      itemCol: String = "item_id",
      negSampling: String = "uniform",
      negWeights: Option[DataFrame] = None): DataFrame = {
    require(nNeg > 0 && k > 0, s"need nNeg/k > 0, got $nNeg/$k")
    val q = F.col(queryCol)
    val users = gt.select(queryCol).distinct()
    val excl = train.select(queryCol, itemCol)
      .unionByName(gt.select(queryCol, itemCol)).distinct()
    val cand = users.crossJoin(scores.select(itemCol))
      .join(excl, Seq(queryCol, itemCol), "left_anti")
    // negative draw: "uniform" is the NCF-era default; "popularity"
    // (inclusion ∝ TRAIN popularity, Efraimidis–Spirakis without
    // replacement) is the protocol Koren & Rendle recommend when the
    // production exposure is popularity-skewed — both fully portable.
    // The popularity weight is deliberately decoupled from the scorer:
    // it is `negWeights` (an (item, weight) frame) when given, else
    // distinct-user train popularity computed here — NEVER the `scores`
    // column being evaluated (weighting the draw by the model under test
    // would make the sampling distribution model-dependent, and a scorer
    // emitting zero/negative scores would crash the positive-weight
    // assert in the weighted sampler).
    val drawn = negSampling match {
      case "uniform" => graft.text.Mixing.sampleExactKPerGroup(
        cand, Seq(queryCol), nNeg, Seq(queryCol, itemCol), seed)
        .join(scores, Seq(itemCol))
      case "popularity" =>
        val w = negWeights
          .getOrElse(itemPopularity(train, queryCol, itemCol)
            .withColumnRenamed("score", "weight"))
          .select(F.col(itemCol), F.col("weight"))
        graft.text.Mixing.sampleWeightedKPerGroup(
          cand.join(w, Seq(itemCol)), Seq(queryCol), nNeg,
          "weight", Seq(queryCol, itemCol), seed)
          .drop("weight")
          .join(scores, Seq(itemCol))
      case other => throw new IllegalArgumentException(
        s"unknown negSampling '$other' (expected uniform|popularity)")
    }
    val negs = drawn
      .select(q, F.col(itemCol).as("_ni"), F.col("score").as("_ns"))
    // cold positives (absent from the train catalog) score 0: every
    // scored negative outranks them — the honest cold-start rank
    val pos = gt.join(scores, Seq(itemCol), "left")
      .select(q, F.col(itemCol).as("_pi"),
        F.coalesce(F.col("score"), F.lit(0L)).as("_ps"))
    val above: Column = F.col("_ns") > F.col("_ps") ||
      (F.col("_ns") === F.col("_ps") && F.col("_ni") < F.col("_pi"))
    val ranked = pos.join(negs, Seq(queryCol), "left")
      .groupBy(q, F.col("_pi"), F.col("_ps"))
      .agg((F.lit(1L) + F.coalesce(
        F.sum(F.when(above, 1L).otherwise(0L)), F.lit(0L))).as("_rank"))
    ranked.agg(
      F.count(F.lit(1)).as("n_pairs"),
      F.expr(s"(sum(CASE WHEN _rank <= $k THEN 1 ELSE 0 END) * 1000000) div count(*)")
        .as(s"hr_at_${k}_ppm"),
      F.expr("sum(1000000 div _rank) div count(*)").as("mrr_ppm"),
      F.expr("(sum(_rank) * 1000000) div count(*)").as("mean_rank_ppm"))
  }
}
