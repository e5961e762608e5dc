package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}

/** Structural certificates for top-k recommendation outputs whose scores a
  * relational oracle cannot recompute (MLlib solvers, RNG samplers).
  *
  * The oracle can't check WHAT the model ranked, but it CAN check that the
  * output honors the predict contract (reference _predict_wrap,
  * base_rec.py:258-314): every train query answered, the per-query row
  * count exactly min(k, catalog − seen) (the seen-filter + top-k crop
  * algebra), zero recommendations of already-seen items, and finite
  * scores. Each fact collapses to one verdict row the driver gate
  * hash-compares against constants — the same pattern as the r8
  * slim-twin-parity / thompson-bounds / w2v-ann-recall gates.
  *
  * Scale shape: two aggregations and one left-semi join over the recs
  * frame (≤ k rows per query), plus one distinct over the log — nothing
  * here exceeds the cost of the predict being certified.
  */
object Certificates {

  /** One verdict row (model, n_queries, k_ok, unseen_ok, scores_finite)
    * for a top-k predict output against its training log.
    *
    * `exactCount = true` pins the per-query row count to
    * min(k, |catalog| − |seen_q|) — right for models whose candidate set
    * is the full fit catalog (ALS, RandomRec, ItemKNN…). Models that
    * restrict candidates structurally (ClusterRec's per-cluster catalog)
    * use `exactCount = false`, which pins 1 ≤ rows ≤ k instead.
    */
  def topK(recs: DataFrame, log: DataFrame, k: Int, model: String,
      cols: RecCols = RecCols(), exactCount: Boolean = true): DataFrame = {
    val seen = log.select(cols.query, cols.item).distinct()
    val catalog = log.select(cols.item).distinct().count() // bounded scalar
    val seenCounts = seen.groupBy(cols.query).agg(F.count(F.lit(1)).as("_seen"))

    val perQuery = recs.groupBy(cols.query).agg(F.count(F.lit(1)).as("_n"))
    val countOk =
      if (exactCount)
        perQuery.join(seenCounts, Seq(cols.query), "left")
          .select(F.col("_n"),
            F.least(F.lit(k.toLong),
              F.lit(catalog) - F.coalesce(F.col("_seen"), F.lit(0L)))
              .as("_exp"))
          .agg(F.count(F.lit(1)).as("_nq"),
            (F.sum(F.when(F.col("_n") === F.col("_exp"), 0L).otherwise(1L))
              === 0L).as("_k_ok"))
      else
        perQuery.agg(F.count(F.lit(1)).as("_nq"),
          (F.min("_n") >= 1L && F.max("_n") <= k.toLong).as("_k_ok"))

    val overlap = recs.join(seen, Seq(cols.query, cols.item), "left_semi")
      .agg(F.count(F.lit(1)).as("_overlap"))
    val finite = recs.agg(
      (F.sum(F.when(F.col(cols.rating).isNull ||
          F.isnan(F.col(cols.rating).cast("double")), 1L).otherwise(0L))
        === 0L).as("_fin"))

    countOk.crossJoin(F.broadcast(overlap)).crossJoin(F.broadcast(finite))
      .select(F.lit(model).as("model"),
        F.col("_nq").as("n_queries"),
        F.col("_k_ok").as("k_ok"),
        (F.col("_overlap") === 0L).as("unseen_ok"),
        F.col("_fin").as("scores_finite"))
  }
}
