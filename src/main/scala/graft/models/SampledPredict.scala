package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Sampling-mode predict for PERSONALIZED score tables — the reference's
  * NonPersonalizedRecommender sampling strategy (base_rec.py:1259-1364:
  * zero-floor the relevance, normalize, draw k without replacement, report
  * the selection probability) generalized to models whose relevance is
  * per-(query, item) rather than one global popularity vector: Markov2,
  * SlopeOne, EASE, P3alpha and any other `predictPairs` surface. The
  * reference only ships sampling for the non-personalized family; this is
  * the engine extension that gives the round-12 model families the same
  * `sample=True` / `predict_proba` contract the bandits already have.
  *
  * The draw is the Efraimidis–Spirakis (2006) exponential-sort key
  * `ln(u + 1e-18) / w` — u from the portable (seed, query, item) md5 hash
  * ([[graft.core.PortableHash]]), so the whole sampler is one rank window
  * over the score table: deterministic across partition layouts and
  * engines (DuckDB-replayable), no RNG state on executors, nothing
  * driver-side. Dividing by the RAW floored weight w instead of the
  * normalized probability p = w/Σw yields the IDENTICAL per-query order
  * (Σw is a positive per-query constant), so the key never touches the
  * normalization sum.
  *
  * Weight floor: the reference floors exact zeros to 1e-6
  * (get_items_pd, base_rec.py:1259-1281); personalized rating predictors
  * can also emit NEGATIVE scores (EASE's signature negative weights,
  * SlopeOne deviations), so the floor here is `rating <= 0 → 1e-6` — the
  * natural extension, documented deviation. NOTE for oracle-exactness:
  * when every score in the pool is a positive exact integer (the ppm/ppt
  * score surfaces), per-query Σw is an exact integer sum and the reported
  * probability is one deterministic IEEE division — fully hash-stable.
  * Pools containing floored (1e-6) weights make Σw a float sum whose
  * last-ulp depends on add order; keep gates on positive-score pools.
  *
  * SCALE: one hash-partitioned rank window on the query key over the
  * score table the caller already materialized — WindowGroupLimit crops
  * map-side, no driver action, no shuffle beyond the window's own.
  */
object SampledPredict {
  private def floored(ratingCol: String) =
    F.when(F.col(ratingCol) <= 0.0, F.lit(1e-6))
      .otherwise(F.col(ratingCol).cast("double"))

  /** Draw `k` items per query without replacement with inclusion
    * probability ∝ the zero/negative-floored score. Output columns:
    * (queryCol, itemCol, rank BIGINT ∈ [1,k], prob DOUBLE) where prob is
    * the per-query normalized selection weight (the reference's returned
    * relevance, base_rec.py:1330-1353). */
  def sampleScores(scores: DataFrame, k: Int, seed: Long = 42L,
      hashMode: String = "portable", queryCol: String = "query_id",
      itemCol: String = "item_id", ratingCol: String = "rating"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val w = floored(ratingCol)
    val u = graft.core.PortableHash.uniformBy(
      hashMode, seed, F.col(queryCol), F.col(itemCol))
    val win = Window.partitionBy(queryCol)
      .orderBy(F.col("_esk").desc, F.col(itemCol).asc)
    val tot = Window.partitionBy(queryCol)
    scores
      .withColumn("_w", w)
      // normalization over the FULL pool — materialized as a column
      // BEFORE the rank crop (a window sum after the filter would
      // normalize over the k survivors only)
      .withColumn("_tot", F.sum("_w").over(tot))
      .withColumn("_esk", F.log(u + F.lit(1e-18)) / F.col("_w"))
      .withColumn("_rk", F.row_number().over(win))
      .filter(F.col("_rk") <= k)
      .select(F.col(queryCol), F.col(itemCol),
        F.col("_rk").cast("long").as("rank"),
        (F.col("_w") / F.col("_tot")).as("prob"))
  }

  /** Action distribution of the sampled policy, tiled over the k slate
    * positions (the reference's sampling-mode `_predict_proba`,
    * base_rec.py:1400-1443: exact at position 0, position-independent
    * beyond — np.tile, ignoring without-replacement renormalization).
    * Output: (queryCol, itemCol, position BIGINT ∈ [0,k), prob DOUBLE),
    * |scores|·k rows. */
  def probaFromScores(scores: DataFrame, k: Int,
      queryCol: String = "query_id", itemCol: String = "item_id",
      ratingCol: String = "rating"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val tot = Window.partitionBy(queryCol)
    scores
      .withColumn("_w", floored(ratingCol))
      // normalization BEFORE the explode: a window sum in the same
      // projection as the generator runs over the k-times-tiled rows
      // (Generate plans below Window) and inflates Σw by k
      .withColumn("_tot", F.sum("_w").over(tot))
      .select(F.col(queryCol), F.col(itemCol),
        F.explode(F.sequence(F.lit(0L), F.lit((k - 1).toLong))).as("position"),
        (F.col("_w") / F.col("_tot")).as("prob"))
  }
}
