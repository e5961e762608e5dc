package graft.models

import org.apache.spark.sql.DataFrame

/** Uniform negative sampling for implicit-feedback / contrastive training:
  * per query, `n` catalog items drawn uniformly WITHOUT replacement, never
  * from the query's own history. The draw IS [[RandomRec]] with uniform
  * weights — Efraimidis–Spirakis with equal weights is a uniform
  * without-replacement sample — so the operator inherits the whole scale
  * path for free: the Exp(w)-threshold pre-crop keeps the |queries| ×
  * |catalog| stream inside whole-stage codegen, the bounded O(n)-state
  * heap crops per query with no window sort, the seen anti-join enforces
  * "never a positive", and the portable md5 hash makes every draw
  * layout-independent and DuckDB-mirrorable (gate `sample_negatives`).
  *
  * `hashMode = "fast"` swaps in the codegen xxhash64 draw for production
  * corpora where the per-pair md5 dominates (same contract as RandomRec).
  * Complements `Similarity.hardNegatives` — this is the cheap uniform
  * tier; hard-negative mining is the similarity-ranked tier.
  */
object Negatives {
  def sample(log: DataFrame, n: Int, seed: Long = 13,
      hashMode: String = "portable", cols: RecCols = RecCols()): DataFrame =
    new RandomRec("uniform", seed = seed, hashMode = hashMode, cols = cols)
      .fit(log).predict(log, k = n)
}
