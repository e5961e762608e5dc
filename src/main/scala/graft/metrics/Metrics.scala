package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.models.RecCols

/** Ranking-metric kernels as native Catalyst array expressions.
  *
  * Per-user semantics follow the reference's authoritative Scala kernels
  * (scala/src/main/scala/org/apache/spark/replay/utils/ScalaPySparkUDFs
  * .scala:19-158) re-expressed with higher-order functions
  * (`aggregate`/`transform`/`slice`/`array_intersect`) so everything stays
  * inside whole-stage codegen — no UDFs, no Python workers, no
  * per-row JVM↔interpreter crossings (SURVEY §2.11, §3.3).
  *
  * Inputs per user: `pred` = item array ranked best-first, `gt` = ground
  * truth item set. Every kernel returns 0.0 for empty pred or gt exactly
  * like the reference.
  */
object Kernels {
  private def predK(pred: Column, k: Int): Column = F.slice(pred, 1, k)
  /** array<boolean> of hit flags over the first k predictions. */
  private def hitFlags(pred: Column, gt: Column, k: Int): Column =
    F.transform(predK(pred, k), x => F.array_contains(gt, x))
  private def emptyGuard(pred: Column, gt: Column, value: Column): Column =
    F.when(F.size(pred) === 0 || F.size(gt) === 0, 0.0).otherwise(value)

  /** HitRate@k (ScalaPySparkUDFs.scala:37-47). */
  def hitRate(pred: Column, gt: Column, k: Int): Column =
    emptyGuard(pred, gt,
      F.when(F.size(F.array_intersect(predK(pred, k), gt)) > 0, 1.0).otherwise(0.0))

  /** Precision@k (ScalaPySparkUDFs.scala:107-116): |hits| / k. */
  def precision(pred: Column, gt: Column, k: Int): Column =
    F.when(F.size(pred) === 0, 0.0).otherwise(
      F.size(F.array_intersect(predK(pred, k), gt)).cast("double") / k)

  /** Recall@k (ScalaPySparkUDFs.scala:118-127): |hits| / |gt|. */
  def recall(pred: Column, gt: Column, k: Int): Column =
    F.when(F.size(gt) === 0, 0.0).otherwise(
      F.size(F.array_intersect(predK(pred, k), gt)).cast("double") / F.size(gt))

  /** MRR@k (ScalaPySparkUDFs.scala:95-105): 1 / rank of first hit. */
  def mrr(pred: Column, gt: Column, k: Int): Column = {
    val firstHit = F.aggregate(
      hitFlags(pred, gt, k),
      F.struct(F.lit(0).as("rank"), F.lit(0).as("i")),
      (acc, h) => F.struct(
        F.when(acc.getField("rank") > 0, acc.getField("rank"))
          .when(h, acc.getField("i") + 1)
          .otherwise(0).as("rank"),
        (acc.getField("i") + 1).as("i")),
      acc => acc.getField("rank"))
    emptyGuard(pred, gt,
      F.when(firstHit > 0, F.lit(1.0) / firstHit).otherwise(0.0))
  }

  /** MAP@k (ScalaPySparkUDFs.scala:19-35): (Σ_hits tpCum/i) / k. */
  def map(pred: Column, gt: Column, k: Int): Column = {
    val s = F.aggregate(
      hitFlags(pred, gt, k),
      F.struct(F.lit(0).as("tp"), F.lit(0.0).as("s"), F.lit(0).as("i")),
      (acc, h) => {
        val tp = acc.getField("tp"); val i = acc.getField("i")
        F.struct(
          (tp + F.when(h, 1).otherwise(0)).as("tp"),
          (acc.getField("s") + F.when(h,
            (tp + 1).cast("double") / (i + 1)).otherwise(0.0)).as("s"),
          (i + 1).as("i"))
      },
      acc => acc.getField("s"))
    emptyGuard(pred, gt, s / k)
  }

  /** NDCG@k (ScalaPySparkUDFs.scala:49-68): binary gain, log2 discount,
    * ideal DCG over min(k, |gt|) positions. */
  def ndcg(pred: Column, gt: Column, k: Int): Column = {
    val dcg = F.aggregate(
      hitFlags(pred, gt, k),
      F.struct(F.lit(0.0).as("s"), F.lit(0).as("i")),
      (acc, h) => F.struct(
        (acc.getField("s") + F.when(h,
          F.lit(1.0) / F.log2(acc.getField("i") + 2)).otherwise(0.0)).as("s"),
        (acc.getField("i") + 1).as("i")),
      acc => acc.getField("s"))
    val idcg = F.aggregate(
      F.sequence(F.lit(1), F.least(F.lit(k), F.size(gt))),
      F.lit(0.0),
      (s, i) => s + F.lit(1.0) / F.log2(i + 1))
    emptyGuard(pred, gt, dcg / idcg)
  }

  /** NCISPrecision@k (ScalaPySparkUDFs.scala:142-158): hit-weighted
    * precision — Σ weights of hit positions / Σ weights of first k. */
  def ncisPrecision(pred: Column, weights: Column, gt: Column, k: Int): Column = {
    val hitWeighted = F.aggregate(
      F.zip_with(predK(pred, k), F.slice(weights, 1, k), (p, w) =>
        F.when(F.array_contains(gt, p), w).otherwise(0.0)),
      F.lit(0.0), (acc, v) => acc + v)
    val totalW = F.aggregate(F.slice(weights, 1, k), F.lit(0.0), (acc, v) => acc + v)
    F.when(F.size(pred) === 0 || F.size(weights) === 0, 0.0)
      .otherwise(hitWeighted / totalW)
  }

  /** RocAuc@k (ScalaPySparkUDFs.scala:70-93). */
  def rocAuc(pred: Column, gt: Column, k: Int): Column = {
    val agg = F.aggregate(
      hitFlags(pred, gt, k),
      F.struct(F.lit(0).as("fpCur"), F.lit(0).as("fpCum"), F.lit(0).as("len")),
      (acc, h) => F.struct(
        (acc.getField("fpCur") + F.when(h, 0).otherwise(1)).as("fpCur"),
        (acc.getField("fpCum") + F.when(h, acc.getField("fpCur")).otherwise(0)).as("fpCum"),
        (acc.getField("len") + 1).as("len")),
      acc => acc)
    val fpCur = agg.getField("fpCur"); val fpCum = agg.getField("fpCum")
    val len = agg.getField("len")
    emptyGuard(pred, gt,
      F.when(fpCur === len, 0.0)
        .when(fpCum === 0, 1.0)
        .otherwise(F.lit(1.0) - fpCum.cast("double") / (fpCur * (len - fpCur))))
  }
}

/** Aggregation descriptors over per-user metric values
  * (reference: replay/metrics/descriptors.py:35-130). */
sealed trait Descriptor {
  def apply(col: Column): Column
}
object Descriptor {
  case object Mean extends Descriptor {
    def apply(col: Column): Column = F.avg(col)
  }
  case object Median extends Descriptor {
    // exact interpolated percentile (ANSI percentile_cont semantics):
    // still a one-pass distributed aggregate, and oracle-mirrorable —
    // percentile_approx sketches have no cross-engine twin
    def apply(col: Column): Column = F.percentile(col, F.lit(0.5))
  }
  final case class ConfidenceInterval(z: Double = 1.96) extends Descriptor {
    def apply(col: Column): Column =
      F.lit(z) * F.coalesce(F.stddev(col), F.lit(0.0)) / F.sqrt(F.count(col))
  }
  /** Sketch-based median for metrics over very large user sets: the exact
    * `percentile` buffers every per-user value in the final aggregation
    * task, which at 10⁹ users is a single-task memory hotspot.
    * `percentile_approx` keeps bounded state (error ≤ relativeError) — use
    * it at scale; keep `Median` where the exact value (or an oracle
    * mirror) is required. */
  final case class MedianApprox(relativeError: Double = 0.001) extends Descriptor {
    def apply(col: Column): Column =
      F.percentile_approx(col, F.lit(0.5), F.lit((1.0 / relativeError).toInt))
  }
}

/** Shared-enrichment evaluator (reference: base_metric.py:111-343 +
  * offline_metrics.py:12-482).
  *
  * One groupBy builds every user's ranked prediction array (struct sort with
  * negated rating → rating desc, item asc — deterministic ties) and one
  * builds the ground-truth set; all metrics at all k values evaluate over
  * that single joined frame in one pass.
  */
object Metrics {
  val RankingMetrics: Seq[String] = Seq("hit_rate", "precision", "recall", "map", "mrr", "ndcg", "roc_auc")

  def kernel(name: String, pred: Column, gt: Column, k: Int): Column = name match {
    case "hit_rate"  => Kernels.hitRate(pred, gt, k)
    case "precision" => Kernels.precision(pred, gt, k)
    case "recall"    => Kernels.recall(pred, gt, k)
    case "map"       => Kernels.map(pred, gt, k)
    case "mrr"       => Kernels.mrr(pred, gt, k)
    case "ndcg"      => Kernels.ndcg(pred, gt, k)
    case "roc_auc"   => Kernels.rocAuc(pred, gt, k)
    case other       => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** (query, pred array, gt array); right join on ground-truth users —
    * users without recs score 0, users without gt are excluded
    * (reference base_metric.py:261-275). */
  def enrich(recs: DataFrame, groundTruth: DataFrame, cols: RecCols = RecCols()): DataFrame = {
    val predLists = recs.groupBy(cols.query).agg(
      F.transform(
        F.sort_array(F.collect_list(F.struct(
          (-F.col(cols.rating)).as("nr"), F.col(cols.item).as("i")))),
        s => s.getField("i")).as("pred"))
    val gtSets = groundTruth.groupBy(cols.query)
      .agg(F.collect_set(cols.item).as("gt"))
    gtSets.join(predLists, Seq(cols.query), "left")
      .withColumn("pred", F.coalesce(F.col("pred"), F.array()))
  }

  /** Per-user metrics over an already-enriched (query, pred, gt) frame. */
  def perUserFrom(enriched: DataFrame, metrics: Seq[String], ks: Seq[Int],
      cols: RecCols = RecCols()): DataFrame = {
    val cs = for (m <- metrics; k <- ks)
      yield kernel(m, F.col("pred"), F.col("gt"), k).as(s"${m}_at_$k")
    enriched.select(F.col(cols.query) +: cs: _*)
  }

  /** Per-user metric table: (query, metric value columns) for each k. */
  def perUser(recs: DataFrame, groundTruth: DataFrame, metrics: Seq[String],
      ks: Seq[Int], cols: RecCols = RecCols()): DataFrame =
    perUserFrom(enrich(recs, groundTruth, cols), metrics, ks, cols)

  /** Descriptor aggregation over an enriched frame. */
  def computeFrom(enriched: DataFrame, metrics: Seq[String], ks: Seq[Int],
      descriptor: Descriptor = Descriptor.Mean,
      cols: RecCols = RecCols()): DataFrame = {
    val pu = perUserFrom(enriched, metrics, ks, cols)
    val aggs = for (m <- metrics; k <- ks)
      yield descriptor(F.col(s"${m}_at_$k")).as(s"${m}_at_$k")
    pu.agg(aggs.head, aggs.tail: _*)
  }

  /** Aggregated one-row result per (metric, k) with the given descriptor. */
  def compute(recs: DataFrame, groundTruth: DataFrame, metrics: Seq[String],
      ks: Seq[Int], descriptor: Descriptor = Descriptor.Mean,
      cols: RecCols = RecCols()): DataFrame =
    computeFrom(enrich(recs, groundTruth, cols), metrics, ks, descriptor, cols)

  // ---- catalog metrics (different inputs) --------------------------------

  /** Item exposure distribution: per item, distinct users interacting in
    * the log vs distinct users recommended it in the top-k — the
    * popularity-bias diagnostic (reference: utils/distributions.py:11-33,
    * minus the collect-to-master pandas conversion: the frame stays
    * distributed). Items in neither frame are absent; one-sided items get
    * 0 on the other side (fillna(0) parity). */
  def itemDistribution(log: DataFrame, recs: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val lc = log.groupBy(cols.item)
      .agg(F.countDistinct(cols.query).as("user_count"))
    val rc = graft.core.Ops.getTopKRecs(recs, k, cols.query, cols.item, cols.rating)
      .groupBy(cols.item).agg(F.countDistinct(cols.query).as("rec_count"))
    lc.join(rc, Seq(cols.item), "outer")
      .na.fill(0L, Seq("user_count", "rec_count"))
  }

  /** Coverage@k: share of train items that appear in any user's top-k recs
    * (reference: coverage.py:93-139). */
  def coverage(recs: DataFrame, train: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val topK = graft.core.Ops.getTopKRecs(recs, k, cols.query, cols.item, cols.rating)
    val nTrain = train.select(cols.item).distinct().count().toDouble
    topK.join(train.select(cols.item).distinct(), Seq(cols.item), "left_semi")
      .agg((F.countDistinct(cols.item) / F.lit(nTrain)).as(s"coverage_at_$k"))
  }

  /** Novelty@k: mean per-user share of top-k recs the user has not seen in
    * train (reference: novelty.py:125-152). */
  def novelty(recs: DataFrame, train: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val topK = graft.core.Ops.getTopKRecs(recs, k, cols.query, cols.item, cols.rating)
    val seen = train.select(cols.query, cols.item).distinct()
      .withColumn("_seen", F.lit(1))
    topK.join(seen, Seq(cols.query, cols.item), "left")
      .groupBy(cols.query)
      .agg((F.sum(F.when(F.col("_seen").isNull, 1.0).otherwise(0.0)) /
        F.count(F.lit(1))).as("_nov"))
      .agg(F.avg("_nov").as(s"novelty_at_$k"))
  }

  /** Surprisal@k: mean self-information of recommended items,
    * weight(i) = log2(nUsers / users(i)) / log2(nUsers)
    * (reference: surprisal.py:112-131). */
  def surprisal(recs: DataFrame, train: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val topK = graft.core.Ops.getTopKRecs(recs, k, cols.query, cols.item, cols.rating)
    val nUsers = train.select(cols.query).distinct().count().toDouble
    val weights = train.groupBy(cols.item)
      .agg(F.countDistinct(cols.query).as("_u"))
      .withColumn("_w", F.log2(F.lit(nUsers) / F.col("_u")) / F.log2(F.lit(nUsers)))
    topK.join(weights.select(cols.item, "_w"), Seq(cols.item), "left")
      .withColumn("_w", F.coalesce(F.col("_w"), F.lit(1.0))) // cold item: max self-info
      .groupBy(cols.query).agg(F.avg("_w").as("_s"))
      .agg(F.avg("_s").as(s"surprisal_at_$k"))
  }

  /** Unexpectedness@k: 1 − overlap with a base model's top-k
    * (reference: unexpectedness.py:153). */
  def unexpectedness(recs: DataFrame, baseRecs: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val a = enrich(recs, recs.select(cols.query, cols.item), cols)
      .select(F.col(cols.query), F.slice(F.col("pred"), 1, k).as("pred"))
    val b = enrich(baseRecs, baseRecs.select(cols.query, cols.item), cols)
      .select(F.col(cols.query), F.slice(F.col("pred"), 1, k).as("base"))
    a.join(b, Seq(cols.query), "left")
      .withColumn("base", F.coalesce(F.col("base"), F.array()))
      .withColumn("_u",
        F.lit(1.0) - F.size(F.array_intersect(F.col("pred"), F.col("base"))).cast("double") / k)
      .agg(F.avg("_u").as(s"unexpectedness_at_$k"))
  }

  /** CategoricalDiversity@k: mean distinct categories per user's top-k
    * (reference: categorical_diversity.py:119-160). */
  def categoricalDiversity(recs: DataFrame, itemCategories: DataFrame, k: Int,
      cols: RecCols = RecCols()): DataFrame = {
    val topK = graft.core.Ops.getTopKRecs(recs, k, cols.query, cols.item, cols.rating)
    topK.join(itemCategories, Seq(cols.item), "left")
      .groupBy(cols.query)
      .agg(F.countDistinct("category").cast("double").as("_d"))
      .agg(F.avg("_d").as(s"categorical_diversity_at_$k"))
  }

  /** Cumulative Poisson(1) probabilities P(X ≤ k), k = 0..8 — the inverse-
    * CDF table for the bootstrap weights. Literal decimal strings parse to
    * the identical IEEE double in any engine, so the weight draw is
    * engine-replayable. */
  val PoissonCum: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** Deterministic Poisson-bootstrap confidence interval for the MEAN of
    * a per-entity metric (Efron 1979 resampling; Poisson(1) weights —
    * the streaming-friendly bootstrap of Chamandy et al. 2012 — instead
    * of exact multinomial draws, so each (resample, entity) weight is a
    * pure function of the portable hash and never needs a sequential
    * RNG). The per-query metric frames the evaluator emits are exactly
    * the intended input: "NDCG@5 = 0.31 ± what?" becomes answerable.
    *
    * Everything after the 6dp metric scaling is BIGINT: weights are
    * integers from the inverse-CDF table over u = hash/2⁶⁰, resample
    * means are integer divisions of weighted sums, and the CI bounds are
    * nearest-rank order statistics (ceil ranks, computed with integer
    * arithmetic) over the `resamples` means — cell-exact in any engine,
    * layout-independent by construction.
    *
    * Scale shape: the input is a PER-ENTITY frame (already one row per
    * query — small by the metric pipeline's own contract); the resample
    * blowup is |entities|·resamples rows through ONE groupBy(_b), and the
    * final order statistics sort `resamples` rows (bounded, documented
    * single partition). `alphaPermille` is the PER-TAIL mass in permille
    * (default 25 → the 2.5%/97.5% nearest-rank bounds of a 95% CI).
    * Returns one row: (mean_ppm, lo_ppm, hi_ppm, resamples). */
  /** One-call metric + uncertainty: the per-user metric frame piped into
    * [[bootstrapCI]] — "hit_rate@5 = 0.31 [0.28, 0.34]" as one row
    * (mean_ppm, lo_ppm, hi_ppm, resamples). */
  def computeWithCI(recs: DataFrame, groundTruth: DataFrame, metric: String,
      k: Int, resamples: Int = 200, seed: Long = 7L,
      cols: RecCols = RecCols()): DataFrame =
    bootstrapCI(perUser(recs, groundTruth, Seq(metric), Seq(k), cols),
      cols.query, s"${metric}_at_$k", resamples, seed)

  def bootstrapCI(perEntity: DataFrame, idCol: String, valueCol: String,
      resamples: Int = 200, seed: Long = 7L, alphaPermille: Int = 25): DataFrame = {
    require(resamples >= 20, s"bootstrapCI: need resamples >= 20, got $resamples")
    require(alphaPermille >= 1 && alphaPermille <= 500,
      s"bootstrapCI: alphaPermille out of (0, 500], got $alphaPermille")
    val spark = perEntity.sparkSession
    val u = graft.core.PortableHash.uniform(seed, F.col("_b"), F.col("_id"))
    val w = PoissonCum.zipWithIndex.foldRight(F.lit(PoissonCum.size): Column) {
      case ((p, k), rest) => F.when(u < p, F.lit(k)).otherwise(rest)
    }.cast("long")
    val blown = perEntity
      .select(F.col(idCol).as("_id"),
        F.round(F.col(valueCol) * 1000000).cast("long").as("_v6"))
      .crossJoin(spark.range(resamples).select(F.col("id").as("_b")))
    val means = blown.withColumn("_w", w)
      .groupBy("_b")
      .agg(F.sum(F.col("_w") * F.col("_v6")).as("_sv"), F.sum("_w").as("_sw"))
      .filter(F.col("_sw") > 0L)
      .select(F.col("_b"), F.expr("_sv div _sw").as("_m6"))
    val n = means.agg(F.count(F.lit(1)).as("_n"))
    val ranked = means.withColumn("_r", F.row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(F.col("_m6").asc, F.col("_b").asc)))
    val point = perEntity.agg(
      F.expr(s"sum(cast(round(${valueCol} * 1000000) as bigint)) div count(1)")
        .as("mean_ppm"))
    val lo = F.expr(s"greatest(1L, (_n * $alphaPermille + 999) div 1000)")
    val hi = F.expr(s"(_n * ${1000 - alphaPermille} + 999) div 1000")
    ranked.crossJoin(F.broadcast(n))
      .select(F.col("_m6"), F.col("_r"), lo.as("_lo"), hi.as("_hi"),
        F.col("_n"))
      .agg(F.min(F.when(F.col("_r") === F.col("_lo"), F.col("_m6"))).as("lo_ppm"),
        F.min(F.when(F.col("_r") === F.col("_hi"), F.col("_m6"))).as("hi_ppm"),
        F.min("_n").as("resamples"))
      .crossJoin(F.broadcast(point))
      .select(F.col("mean_ppm"), F.col("lo_ppm"), F.col("hi_ppm"),
        F.col("resamples"))
  }

  /** Rating-error metrics for a predictor's scored pairs — MAE and RMSE
    * in ppm, the evaluation counterpart of [[graft.models.BiasModel]]'s
    * exact-ppm predictions. Inputs are ppm-quantized (floor), the error
    * sums are exact integers (squares through DECIMAL(38) — Σe² reaches
    * n·(Δppm)² ≈ 10²⁰ past BIGINT on real logs), and only the final
    * RMSE sqrt touches floating point (floor-quantized back to ppm —
    * deterministic: both engines take the correctly-rounded IEEE sqrt of
    * the same exact integer). One aggregation, one row out. */
  def ratingErrors(scored: DataFrame, predCol: String,
      actualCol: String): DataFrame =
    scored
      .select((F.floor(F.col(predCol).cast("double") * 1e6).cast("long") -
        F.floor(F.col(actualCol).cast("double") * 1e6).cast("long")).as("_e"))
      .agg(F.count(F.lit(1)).as("n"),
        F.expr("sum(abs(_e)) div count(1)").as("mae_ppm"),
        F.expr("CAST(floor(sqrt(CAST(sum(CAST(_e AS DECIMAL(38, 0)) * _e)" +
          " div count(1) AS DOUBLE))) AS BIGINT)").as("rmse_ppm"))

  /** Spearman rank correlation between two scorings of the same keys, in
    * ppm — the ranker-drift monitor ("how much did this week's popularity
    * order move?"). Keys are restricted to the intersection FIRST, then
    * ranked inside it (so the ranks are a permutation and rho stays in
    * [−1, 1]); ties break by key ascending (a deterministic total order
    * both engines share — documented deviation from textbook average
    * ranks). rho_ppm = 10⁶ − (6·Σd²·10⁶) div (n³ − n), exact DECIMAL(38)
    * arithmetic (Σd² ~ n³ passes BIGINT near ~2M keys). Ranks come from
    * the distributed [[graft.core.Ops.globalRowNumber]] — no
    * single-partition global window. Returns one row (n, rho_ppm);
    * rho_ppm NULL when n < 2. */
  def spearmanPpm(a: DataFrame, b: DataFrame, keyCol: String,
      scoreCol: String): DataFrame = {
    val joined = a.select(F.col(keyCol), F.col(scoreCol).as("_sa"))
      .join(b.select(F.col(keyCol), F.col(scoreCol).as("_sb")), Seq(keyCol))
    val ra = graft.core.Ops.globalRowNumber(joined, "_ra",
      F.col("_sa").desc, F.col(keyCol).asc)
    val rb = graft.core.Ops.globalRowNumber(ra, "_rb",
      F.col("_sb").desc, F.col(keyCol).asc)
    rb.agg(F.count(F.lit(1)).as("n"),
        F.sum(F.expr("CAST(_ra - _rb AS DECIMAL(38, 0)) * (_ra - _rb)"))
          .as("_sd2"))
      .select(F.col("n"),
        F.expr("CASE WHEN n < 2 THEN NULL ELSE CAST(1000000 - " +
          "(6 * _sd2 * 1000000) div (CAST(n AS DECIMAL(38, 0)) * n * n - n)" +
          " AS BIGINT) END").as("rho_ppm"))
  }

  /** Calibration reliability table for a probabilistic scorer (the
    * second-stage reranker / quality classifier check the reference leaves
    * to the caller): scores ppm-quantized (floor, clamped to [0, 10⁶]) and
    * equal-width-binned; per bin the exact count, mean predicted
    * probability and empirical positive rate in ppm, and their gap — all
    * integer arithmetic (`div`), so the whole table hash-compares across
    * engines. One partial+final aggregation over ≤ nBins rows of state. */
  def calibrationBins(scored: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && nBins <= 1000000, s"nBins out of range: $nBins")
    val ppm = F.least(F.lit(1000000L), F.greatest(F.lit(0L),
      F.floor(F.col(probCol).cast("double") * 1e6).cast("long")))
    scored
      .select(ppm.as("_ppm"),
        F.col(labelCol).cast("boolean").cast("long").as("_y"))
      .withColumn("bin", F.least(F.lit(nBins - 1L),
        F.expr(s"(_ppm * $nBins) div 1000000")))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n"),
        F.expr("sum(_ppm) div count(1)").as("conf_ppm"),
        F.expr("(sum(_y) * 1000000) div count(1)").as("acc_ppm"))
      .withColumn("gap_ppm", F.abs(F.col("acc_ppm") - F.col("conf_ppm")))
  }

  /** Expected Calibration Error in ppm: the bin-count-weighted mean of the
    * reliability gaps, ece = Σ_b n_b·|acc_b − conf_b| / N — one row
    * (ece_ppm, max_gap_ppm, n). Exact integer division, same contract as
    * [[calibrationBins]]. */
  def calibrationEce(scored: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame =
    calibrationBins(scored, probCol, labelCol, nBins)
      .agg(F.expr("sum(n * gap_ppm) div sum(n)").as("ece_ppm"),
        F.max("gap_ppm").as("max_gap_ppm"),
        F.sum("n").as("n"))
  /** Popularity-bias diagnostics over a recommendation set (engine extra —
    * Abdollahpouri et al., RecSys 2017 / FLAIRS 2019; the standard
    * long-tail exposure check a production reranker is audited with):
    *
    *   ARP  = mean over users of (Σ_{i∈recs_u} pop(i)) / |recs_u|
    *   APLT = mean over users of |recs_u ∩ tail| / |recs_u|
    *
    * pop(i) = distinct-user train count; the HEAD set is the top
    * `headPermille`/1000 of catalog items by (pop DESC, item ASC) — an
    * integer permille so the head boundary is exact on both engines; the
    * tail is everything else, including items absent from train (pop 0).
    * Both means are exact integer ppm (per-user integral division, then
    * an integral mean over users — the house metric quantization).
    * One row: (n_users, head_count, arp_ppm, aplt_ppm).
    *
    * Scale: pop and the head rank are catalog-sized aggregates; recs join
    * pop by item equi-key — no per-user state beyond the one aggregation. */
  def popularityBias(recs: DataFrame, train: DataFrame,
      headPermille: Int = 200, cols: RecCols = RecCols()): DataFrame = {
    require(headPermille > 0 && headPermille < 1000,
      s"headPermille must be in (0, 1000), got $headPermille")
    // pop cached (ADVICE r12): it feeds the nItems count, the global head
    // rank, AND the per-rec join — uncached that is three full
    // recomputations of the same catalog-sized train aggregate
    val pop = train.groupBy(cols.item)
      .agg(F.countDistinct(cols.query).as("_pop"))
      .cache()
    val nItems = pop.count()
    val headCount = nItems * headPermille / 1000
    // distributed global rank over the catalog-sized aggregate (no
    // single-partition Window.orderBy)
    val head = graft.core.Ops.globalRowNumber(
      pop, "_rnk", F.col("_pop").desc, F.col(cols.item).asc)
      .filter(F.col("_rnk") <= headCount)
      .select(F.col(cols.item), F.lit(1L).as("_head"))
    val perUser = recs.select(cols.query, cols.item)
      .join(pop, Seq(cols.item), "left")
      .join(head, Seq(cols.item), "left")
      .groupBy(cols.query)
      .agg(
        F.expr("(sum(coalesce(_pop, 0L)) * 1000000) div count(1)")
          .as("_arp"),
        F.expr("(sum(CASE WHEN _head IS NULL THEN 1L ELSE 0L END) * 1000000) div count(1)")
          .as("_aplt"))
    val out = perUser.agg(
      F.count(F.lit(1)).as("n_users"),
      F.lit(headCount).as("head_count"),
      F.expr("sum(_arp) div count(1)").as("arp_ppm"),
      F.expr("sum(_aplt) div count(1)").as("aplt_ppm"))
      .localCheckpoint()
    pop.unpersist()
    out
  }
  /** Calibration divergence of a recommendation set (engine extra — Steck,
    * RecSys 2018 "Calibrated Recommendations" §3): per user,
    *
    *   C_KL(u) = KL(p ‖ q̃) = Σ_c p(c|u) · ln( p(c|u) / q̃(c|u) ),
    *   q̃ = (1−α)·q + α·p   (the paper's smoothing, so q̃ > 0 where p > 0)
    *
    * with p = the user's HISTORY category distribution and q = the
    * category distribution of their recommendations. A perfectly
    * calibrated rec list scores 0; a list concentrated on categories the
    * user never touches scores ≈ ln(1/α).
    *
    * Portability: each per-category term is floor-quantized to ppm BEFORE
    * the per-user sum, so the sums are exact integers (order-free — float
    * sums would be partition-order dependent); p, q and the ln argument
    * are built from exact integer counts with the identical operation
    * order mirrored in SQL. Items without a category row are dropped from
    * both distributions (document the category table's coverage).
    * One row: (n_users, mean_ckl_ppm, max_ckl_ppm); users need ≥1
    * categorized history AND rec item to score.
    *
    * Scale: two category-count aggregations plus one per-(user, category)
    * join — nothing beyond the recs/history size, state O(categories) per
    * user. */
  def calibrationDivergence(recs: DataFrame, history: DataFrame,
      itemCats: DataFrame, alpha: Double = 0.01,
      cols: RecCols = RecCols()): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val cats = itemCats.select(F.col(cols.item), F.col("category"))
    def dist(df: DataFrame, cnt: String, tot: String): DataFrame = {
      val c = df.select(cols.query, cols.item).distinct()
        .join(cats, Seq(cols.item))
        .groupBy(cols.query, "category")
        .agg(F.count(F.lit(1)).as(cnt))
      val t = c.groupBy(cols.query).agg(F.sum(cnt).as(tot))
      c.join(t, Seq(cols.query))
    }
    val pSide = dist(history, "hc", "ht")
    val qSide = dist(recs, "rc", "rt")
    val qTot = qSide.select(cols.query, "rt").distinct()
    val terms = pSide
      .join(qSide.select(cols.query, "category", "rc"),
        Seq(cols.query, "category"), "left")
      .join(qTot, Seq(cols.query))
      .withColumn("term_ppm", F.expr(
        s"""CAST(floor((CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)) * ln(
           |  (CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)) /
           |  ((1.0 - CAST($alpha AS DOUBLE)) *
           |     (CAST(coalesce(rc, 0) AS DOUBLE) / CAST(rt AS DOUBLE))
           |   + CAST($alpha AS DOUBLE) *
           |     (CAST(hc AS DOUBLE) / CAST(ht AS DOUBLE)))
           |) * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")))
    val perUser = terms.groupBy(cols.query)
      .agg(F.sum("term_ppm").as("ckl_ppm"))
    perUser.agg(
      F.count(F.lit(1)).as("n_users"),
      F.expr("sum(ckl_ppm) div count(1)").as("mean_ckl_ppm"),
      F.max("ckl_ppm").as("max_ckl_ppm"))
  }
}
