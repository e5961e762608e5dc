package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Domain mixing for training corpora: deterministically down-sample so
  * the per-source proportions hit a target mixture — the standard
  * "N% web, M% code, K% books" recipe applied before packing.
  *
  * Semantics: the output is the LARGEST corpus achievable at exactly the
  * target proportions — total T = min over sources of floor(n_s / p_s),
  * then floor(p_s · T) docs per source, chosen by portable-hash rank
  * (reproducible across cluster layouts AND in the DuckDB oracle).
  * Sources absent from `target` are dropped.
  *
  * Scale shape: one groupBy-count whose result is driver-bounded by the
  * number of SOURCES (a handful, vs billions of docs), then one
  * rank-window partitioned by source. At 100 TB the window sorts only
  * within each source partition — no global order anywhere.
  */
object Mixing {
  def sampleToMixture(docs: DataFrame, target: Map[String, Double],
      seed: Long = 7, idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target mixture must be non-empty with positive weights")
    require(math.abs(target.values.sum - 1.0) < 1e-9,
      s"target mixture must sum to 1, got ${target.values.sum}")
    // per-source counts: #sources rows — driver-bounded by design
    val counts = docs.groupBy(sourceCol).agg(F.count(F.lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = target.keySet -- counts.keySet
    require(missing.isEmpty, // fail fast, not a silently-empty corpus
      s"target sources absent from the corpus: ${missing.mkString(", ")}")
    val total = target.map { case (s, p) =>
      math.floor(counts(s) / p) }.min.toLong
    val limits = target.map { case (s, p) => s -> math.floor(p * total).toLong }
    val limCol = limits.foldLeft(F.lit(0L)) { case (acc, (s, n)) =>
      F.when(F.col(sourceCol) === s, F.lit(n)).otherwise(acc) }
    val w = Window.partitionBy(sourceCol).orderBy(
      graft.core.PortableHash.long(seed, F.col(idCol)), F.col(idCol).asc)
    docs.withColumn("_rn", F.row_number().over(w))
      .filter(F.col("_rn") <= limCol).drop("_rn")
  }

  /** Temperature-scaled mixture: target p_s ∝ n_s^alpha (the
    * multilingual/LLM "α-sampling" rule — Conneau & Lample 2019 §3.1;
    * alpha = 1 keeps the natural distribution, alpha → 0 approaches
    * uniform, intermediate values up-weight small sources without
    * swamping large ones), then [[sampleToMixture]] at that target. The
    * per-source counts are the same driver-bounded #sources aggregate. */
  def sampleWithTemperature(docs: DataFrame, alpha: Double,
      seed: Long = 7, idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val counts = docs.groupBy(sourceCol).agg(F.count(F.lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus")
    val pw = counts.map { case (s, n) => s -> math.pow(n.toDouble, alpha) }
    // normalize with a SORTED-order left fold: a float sum's value depends
    // on addend order at the ulp level, and the DuckDB oracle mirrors this
    // exact sequence (list_reduce over list(… ORDER BY source))
    val z = pw.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    sampleToMixture(docs, pw.map { case (s, v) => s -> v / z },
      seed, idCol, sourceCol)
  }

  /** Token-budget selection: fill each source's token budget with its
    * best documents — the "assemble an N-token training mix" step that
    * follows scoring. Docs are ranked per source by (quality desc, id)
    * — quality is [[TextStats.qualityScore]] rounded to 6dp so both
    * engines order by the same double — and the kept set is the longest
    * per-source PREFIX whose running token total stays ≤ `budgetTokens`
    * (prefix-fill: selection stops at the first overflowing doc; no
    * skip-ahead, so the rule is relational, not sequential).
    *
    * Scale shape: per-doc scoring is scan-side expressions; the running
    * total is [[graft.core.Ops.keyedCumsum]] — range-partitioned prefix
    * sums, NO per-source single-task window, so one giant source cannot
    * serialize the selection. Output: (source, id, n_tokens, quality,
    * cum_tokens), the kept docs. */
  def tokenBudgetSelect(docs: DataFrame, budgetTokens: Long,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      stopwords: Seq[String] = TextStats.LangProfiles("en")): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val t = F.col(textCol)
    val perDoc = docs.select(F.col(sourceCol), F.col(idCol),
      TextStats.tokenCount(t).as("n_tokens"),
      F.round(TextStats.qualityScore(t, stopwords), 6).as("quality"))
    graft.core.Ops.keyedCumsum(perDoc, Seq(sourceCol), "n_tokens",
        "cum_tokens", F.col("quality").desc, F.col(idCol).asc)
      .filter(F.col("cum_tokens") <= budgetTokens)
  }

  /** EXACT stratified sampling: per stratum keep exactly
    * ceil(frac · n_stratum) rows, chosen by portable-hash rank — unlike
    * `df.sampleBy` (Bernoulli per row, count only in expectation), the
    * per-stratum counts are deterministic and the pick is reproducible
    * across cluster layouts and engines (the md5 chain). The standard
    * "hold out exactly 1% of every domain" shape for eval carve-outs.
    *
    * Scale: one rank window partitioned by the strata — sorts only within
    * each stratum partition (the [[sampleToMixture]] shape; a single
    * stratum spanning half the corpus sorts in one task — split such a
    * stratum's key upstream if that bites). `idCols` must uniquely
    * identify rows within a stratum. */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], frac: Double,
      idCols: Seq[String], seed: Long = 13): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    val w = Window.partitionBy(strataCols.map(F.col): _*)
    val ordered = w.orderBy(
      (graft.core.PortableHash.long(seed, idCols.map(F.col): _*).asc +:
        idCols.map(F.col(_).asc)): _*)
    df.withColumn("_ssr", F.row_number().over(ordered).cast("long"))
      .withColumn("_ssn", F.count(F.lit(1)).over(w))
      // the 1e-9 nudge makes ceil honor the EXACT rational contract when
      // frac·n overshoots an integer in IEEE doubles (0.07 · 100 =
      // 7.000000000000001 would otherwise ceil to 8); mirrored in the
      // oracle SQL
      .filter(F.col("_ssr") <=
        F.ceil(F.lit(frac) * F.col("_ssn").cast("double") - F.lit(1e-9)))
      .drop("_ssr", "_ssn")
  }

  /** EXACT count-based companion to [[stratifiedSample]]: keep AT MOST
    * `k` rows per group, chosen by portable-hash rank (deterministic
    * across layouts and engines; groups smaller than k pass through
    * whole). The "k eval docs per domain" / "k examples per class" shape
    * where a FRACTION would give unbounded absolute counts on skewed
    * group sizes.
    *
    * Scale: lowers to the same rank-filter Spark rewrites to
    * WindowGroupLimit — each group keeps an O(k) heap per partition, no
    * full per-group sort. `idCols` must uniquely identify rows within a
    * group. */
  def sampleExactKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      idCols: Seq[String], seed: Long = 13): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val w = Window.partitionBy(groupCols.map(F.col): _*).orderBy(
      (graft.core.PortableHash.long(seed, idCols.map(F.col): _*).asc +:
        idCols.map(F.col(_).asc)): _*)
    df.withColumn("_skr", F.row_number().over(w))
      .filter(F.col("_skr") <= k)
      .drop("_skr")
  }

  /** WEIGHTED exact-k-per-group sampling without replacement —
    * Efraimidis–Spirakis (2006) exponential sort, per group: each row
    * draws the portable-hash uniform u and keeps the k largest
    * `ln(u)/w` keys (≡ u^(1/w): inclusion probability ∝ weight, no
    * replacement, fully deterministic and oracle-replayable — the
    * [[graft.text.Dsir]] log-parity precedent). u is clamped to
    * [2⁻⁵³, 1−2⁻⁵³] (the Dsir tail rule) so ln never sees 0. Weights
    * must be positive (enforced row-wise). One keyed rank window; ties
    * broken by ids. The weighted half [[sampleExactKPerGroup]] lacks. */
  def sampleWeightedKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      weightCol: String, idCols: Seq[String], seed: Long = 13): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val lo = F.lit(1.0) / F.lit(9007199254740992.0) // 2^-53, exact
    val u = F.least(F.greatest(
      graft.core.PortableHash.uniform(seed, idCols.map(F.col): _*), lo),
      F.lit(1.0) - lo)
    val w = F.col(weightCol).cast("double")
    val key = F.when(F.assert_true(w > 0d,
        F.lit(s"sampleWeightedKPerGroup: non-positive weight")).isNull,
      F.log(u) / w)
    val win = Window.partitionBy(groupCols.map(F.col): _*)
      .orderBy((key.desc +: idCols.map(F.col(_).asc)): _*)
    df.withColumn("_wkr", F.row_number().over(win))
      .filter(F.col("_wkr") <= k)
      .drop("_wkr")
  }

  /** Deterministic repetition to EXACT per-group target counts — the
    * UP-sampling half of mixture construction ([[sampleToMixture]] only
    * goes down): every group emits exactly `target` rows as
    * `floor(target/n)` full copies of the group plus a portable-hash-
    * ranked top-up of `target mod n` rows carrying one extra copy. A
    * group larger than its target degenerates to the exact subsample
    * (zero full copies, top-up only) — one operator covers both
    * directions. Each copy carries a 0-based `rep` index so downstream
    * shuffles/dataloaders treat repetitions as distinct rows
    * (deterministicShuffle hashes on (ids..., rep)).
    *
    * Scale shape: one group-sized count aggregate (broadcast back), one
    * keyed rank window, one `sequence` explode — output rows ∝
    * Σ targets, never touched twice. Deterministic: same (seed, ids) →
    * identical copies on any layout or engine. */
  def repeatToTarget(df: DataFrame, groupCols: Seq[String], target: Long,
      idCols: Seq[String], seed: Long = 13, repCol: String = "rep"): DataFrame = {
    require(target > 0, s"need target > 0, got $target")
    val counts = df.groupBy(groupCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("_gn"))
    val w = Window.partitionBy(groupCols.map(F.col): _*).orderBy(
      (graft.core.PortableHash.long(seed, idCols.map(F.col): _*).asc +:
        idCols.map(F.col(_).asc)): _*)
    df.join(F.broadcast(counts), groupCols)
      .withColumn("_rtr", F.row_number().over(w))
      .withColumn("_reps",
        F.expr(s"${target}L div _gn") +
          F.when(F.col("_rtr") <= F.expr(s"${target}L % _gn"), 1L)
            .otherwise(0L))
      .filter(F.col("_reps") > 0L)
      .withColumn(repCol,
        F.explode(F.sequence(F.lit(0L), F.col("_reps") - 1L)))
      // the USING join reordered columns — restore the caller's layout
      .select((df.columns.toSeq :+ repCol).map(F.col): _*)
  }
}
