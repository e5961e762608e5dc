package graft.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.core.PortableHash

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"). The
  * standard recipe for skewing a raw web corpus toward a target domain
  * before pretraining: represent documents as hashed n-gram count
  * vectors, fit two bag-of-hashed-ngrams distributions (target p,
  * raw q), score every raw document with its log importance weight
  * `Σ_b count_doc[b] · (ln p[b] − ln q[b])`, and resample with Gumbel
  * noise on the log weights (Gumbel-top-k ≡ sampling without replacement
  * ∝ exp(w)).
  *
  * Everything is relational and engine-portable:
  *  - features: whitespace unigrams + bigrams hashed into `buckets` cells
  *    with the shared [[PortableHash]] recipe (the same md5-prefix form
  *    every oracle mirrors);
  *  - distributions: two global bucket-count aggregations (one shuffle of
  *    at most `buckets` cells each after map-side combine) + Laplace
  *    smoothing `(cnt + α) / (N + α·B)` — integer counts in, so the
  *    IEEE doubles agree across engines;
  *  - per-document weight: one join against the broadcast-size λ table
  *    and a SORTED-bucket left fold (the mixture-gate lesson: an
  *    unordered float sum is summation-order-dependent and would break
  *    the cross-engine hash);
  *  - resampling: `w + Gumbel(md5(seed, id))` with the portable uniform,
  *    a deterministic global top-k.
  *
  * At 100 TB: the λ table is `buckets` rows (broadcast), the feature
  * explode is corpus-sized but collapses map-side into ≤ buckets cells
  * per partition for the global counts, and the per-doc weight is one
  * groupBy over the doc's own distinct buckets — no all-pairs step
  * anywhere. Selection is the engine's usual bounded top-k.
  */
object Dsir {

  /** Whitespace tokens, lowercased; empty-string cells dropped. */
  private def toks(text: Column): Column =
    F.filter(F.split(F.lower(F.trim(text)), "\\s+"), t => t =!= "")

  /** Unigrams + space-joined bigrams, WITH multiplicity (unlike the
    * dedup shingles, counts matter here). */
  private[text] def grams(text: Column): Column = {
    val ts = toks(text)
    val bigrams = F.when(F.size(ts) >= 2,
      F.transform(F.sequence(F.lit(0), F.size(ts) - 2),
        i => F.concat_ws(" ", F.element_at(ts, i + 1), F.element_at(ts, i + 2))))
      .otherwise(F.array())
    F.concat(ts, bigrams)
  }

  /** (idCol, bucket, cnt) hashed n-gram counts per document. */
  def hashedCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 1024,
      seed: Long = 7): DataFrame =
    docs.select(F.col(idCol), F.explode(grams(F.col(textCol))).as("_g"))
      .select(F.col(idCol),
        F.pmod(PortableHash.long(seed, F.col("_g")), F.lit(buckets.toLong))
          .as("bucket"))
      .groupBy(idCol, "bucket").agg(F.count(F.lit(1)).as("cnt"))

  /** Per-bucket smoothed log-ratio λ[b] = ln p̂[b] − ln q̂[b] over the FULL
    * bucket domain (zero-count buckets included — raw docs hit cells the
    * target never saw). Output: (bucket, lam), `buckets` rows. */
  def bucketLogRatio(target: DataFrame, raw: DataFrame,
      textCol: String = "text", buckets: Int = 1024, alpha: Double = 0.5,
      seed: Long = 7): DataFrame = {
    val spark = target.sparkSession
    def totals(docs: DataFrame, out: String): DataFrame =
      docs.select(F.explode(grams(F.col(textCol))).as("_g"))
        .select(F.pmod(PortableHash.long(seed, F.col("_g")),
          F.lit(buckets.toLong)).as("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).as(out))
    val t = totals(target, "_tc")
    val r = totals(raw, "_rc")
    val domain = spark.range(buckets).select(F.col("id").as("bucket"))
    val joined = domain
      .join(t, Seq("bucket"), "left").join(r, Seq("bucket"), "left")
      .select(F.col("bucket"),
        F.coalesce(F.col("_tc"), F.lit(0L)).as("_tc"),
        F.coalesce(F.col("_rc"), F.lit(0L)).as("_rc"))
    val nt = joined.agg(F.sum("_tc")).first().getLong(0)
    val nr = joined.agg(F.sum("_rc")).first().getLong(0)
    val b = buckets.toDouble
    joined.select(F.col("bucket"),
      (F.log((F.col("_tc").cast("double") + alpha) / (nt + alpha * b)) -
        F.log((F.col("_rc").cast("double") + alpha) / (nr + alpha * b)))
        .as("lam"))
  }

  /** Per-raw-document log importance weight: the sorted-bucket left fold
    * of `cnt · λ[bucket]`. Output: (idCol, log_weight). */
  def logWeights(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024, alpha: Double = 0.5, seed: Long = 7): DataFrame = {
    val lam = bucketLogRatio(target, raw, textCol, buckets, alpha, seed)
    val counts = hashedCounts(raw, idCol, textCol, buckets, seed)
    counts.join(F.broadcast(lam), Seq("bucket"))
      .groupBy(idCol)
      .agg(F.aggregate(
        F.transform(
          F.array_sort(F.collect_list(F.struct(F.col("bucket"),
            (F.col("cnt").cast("double") * F.col("lam")).as("_term")))),
          s => s.getField("_term")),
        F.lit(0.0), (acc, x) => acc + x).as("log_weight"))
  }

  /** Gumbel-top-k resampling on the log weights: key = w/τ +
    * Gumbel(u(seed, id)), deterministic and oracle-mirrorable; τ = 1 is
    * the paper's sampling-without-replacement ∝ exp(w). Output adds
    * (gumbel_key, rank), keeps the top `k`. */
  def resample(weights: DataFrame, k: Int, idCol: String = "doc_id",
      seed: Long = 11, temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    val u0 = PortableHash.uniform(seed, F.col(idCol))
    // Clamp u into [2^-53, 1-2^-53] before the double log: the raw hash
    // uniform is a multiple of 2^-60 in [0,1), and BOTH tails break the
    // Gumbel key in IEEE arithmetic — u=0 makes the inner ln(1-u)=ln(1)=0
    // so the outer ln sees 0 (Spark returns NULL, which the bounded top-k
    // heap's non-null contract then silently drops), and any u close enough
    // to 1 that 1-u rounds to 1.0 hits the same ln(0) from the other side.
    // 2^-53 is the smallest clamp where 1-u is still exactly representable
    // below 1, so both lns stay finite and nonzero. Constants are built
    // arithmetically (1/2^53) so the oracle SQL mirrors them bit-exactly.
    val lo = F.lit(1.0) / F.lit(9007199254740992.0) // 2^-53, exact
    val u = F.least(F.greatest(u0, lo), F.lit(1.0) - lo)
    val key = (F.col("log_weight") / temperature) -
      F.log(-F.log(F.lit(1.0) - u))
    // global top-k via the O(k)-state bounded heap (map-side partials,
    // never a corpus-wide sort); the rank window runs on ≤ k rows
    val keyed = weights.withColumn("_gk", key)
    val top = graft.core.Ops.getTopKRecsBounded(
      keyed.select(F.lit(0L).as("_all"), F.col(idCol), F.col("_gk")),
      k, "_all", idCol, "_gk")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("_gk").desc, F.col(idCol).asc)
    top.join(keyed.select(F.col(idCol), F.col("log_weight")), Seq(idCol))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .select(F.col(idCol), F.col("log_weight"),
        F.col("_gk").as("gumbel_key"), F.col("rank"))
  }
}
