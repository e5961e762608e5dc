package graft.metrics

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.models.{BaseRecommender, RecCols}

/** Models × metrics comparison table (reference: replay/metrics/
  * experiment.py:7-200): fit-predict every candidate model on the same
  * split, evaluate the same metric set over the SHARED enrichment, collect
  * one row per model. */
final class Experiment(
    val metrics: Seq[String],
    val ks: Seq[Int],
    cols: RecCols = RecCols(),
) {
  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]

  def addResult(name: String, recs: DataFrame, groundTruth: DataFrame,
      fitPredTime: Double = Double.NaN): this.type = {
    val row = Metrics.compute(recs, groundTruth, metrics, ks, Descriptor.Mean, cols).first()
    val names = for (m <- metrics; k <- ks) yield s"${m}_at_$k"
    results(name) = names.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
    }.toMap + ("fit_pred_time" -> fitPredTime)
    this
  }

  /** Fit-predict every model, recording wall-clock `fit_pred_time` per
    * model (the column the reference's experiment tables publish and
    * BASELINE timings are built from, res_1m.csv): the rec set is cached
    * and counted inside the timed span so the lazy predict plan actually
    * executes there, then reused by the metric pass. */
  def run(models: Map[String, BaseRecommender], train: DataFrame, test: DataFrame,
      k: Int): this.type = {
    val gt = test.select(cols.query, cols.item).distinct()
    models.foreach { case (name, model) =>
      val t0 = System.nanoTime()
      val recs = model.fitPredict(train, k).cache()
      recs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      addResult(name, recs, gt, secs)
      recs.unpersist()
    }
    this
  }

  /** One row per model, one column per metric@k, plus fit_pred_time
    * (NaN for rows added via addResult without timing). */
  def table(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val names = (for (m <- metrics; k <- ks) yield s"${m}_at_$k").toList :+ "fit_pred_time"
    val rows = results.toSeq.map { case (model, vals) =>
      org.apache.spark.sql.Row.fromSeq(model +: names.map(n =>
        vals.getOrElse(n, Double.NaN)))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(StructField("model", StringType) ::
      names.map(StructField(_, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }
}

/** Deterministic hyper-parameter search (replacing the reference's Optuna
  * mixin, models/optimization/optuna_mixin.py:17-244): exhaustive grid or
  * seeded random subsample of the grid, scored by a target metric on a
  * holdout split. */
object GridSearch {
  final case class Trial(params: Map[String, Double], score: Double)

  /** Run independent trials, optionally `parallelism` at a time on the
    * shared session (Spark schedules concurrent jobs fine; each trial
    * builds its own model, so nothing is shared). Results come back in
    * INPUT order either way — parallelism changes wall-clock only, never
    * values or order, so the SQL oracles are unaffected. Default 1: the
    * caller opts into the extra concurrent memory footprint. */
  private[metrics] def mapTrials[A, B](xs: Seq[A], parallelism: Int)(f: A => B): Seq[B] =
    if (parallelism <= 1 || xs.size <= 1) xs.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, xs.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(xs.map(x => Future(f(x)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }

  def grid(space: Map[String, Seq[Double]]): Seq[Map[String, Double]] =
    space.foldLeft(Seq(Map.empty[String, Double])) { case (acc, (k, vs)) =>
      for (m <- acc; v <- vs) yield m + (k -> v)
    }

  /** Evaluate `build(params).fitPredict(train)` against test with
    * `metric@k`, maximizing. Runs trials sequentially (each trial is
    * itself fully parallel inside Spark). */
  def search(
      space: Map[String, Seq[Double]],
      build: Map[String, Double] => BaseRecommender,
      train: DataFrame, test: DataFrame,
      metric: String = "ndcg", k: Int = 10,
      maxTrials: Int = Int.MaxValue, seed: Long = 42,
      cols: RecCols = RecCols(), parallelism: Int = 1,
  ): Seq[Trial] = {
    val all = grid(space)
    val trials =
      if (all.size <= maxTrials) all
      else new scala.util.Random(seed).shuffle(all).take(maxTrials)
    val gt = test.select(cols.query, cols.item).distinct()
    mapTrials(trials, parallelism) { params =>
      val recs = build(params).fitPredict(train, k)
      val score = Metrics.compute(recs, gt, Seq(metric), Seq(k), Descriptor.Mean, cols)
        .first().getDouble(0)
      Trial(params, score)
    }.sortBy(-_.score)
  }
}

/** Budgeted hyper-parameter search over continuous borders — the engine's
  * replacement for the reference's Optuna `optimize(budget, param_borders)`
  * (models/optimization/optuna_mixin.py:167-244). The TPE sampler is
  * replaced by seeded md5 draws: every trial's parameters are a pure
  * function of (seed, trial index, param name), so the whole search is
  * deterministic, independent of cluster layout, and mirrorable
  * term-by-term in a SQL oracle — properties TPE cannot give. At the
  * ≤ tens-of-trials budgets the reference defaults to (budget=10), random
  * search is within noise of TPE on low-dimensional spaces. */
object RandomSearch {
  import GridSearch.Trial

  /** Driver-side twin of [[graft.core.PortableHash.uniform]]: md5 of the
    * key string → first 15 hex chars → BIGINT / 2^60 ∈ [0, 1). Computed on
    * the JVM (the trial sequence must exist at plan-build time); the
    * DuckDB oracle recomputes the identical value as
    * `('0x' || substr(md5(key), 1, 15))::BIGINT / 2^60`. */
  def uniformDraw(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16).toDouble / math.pow(2, 60)
  }

  /** The deterministic trial sequence: param p of trial t is
    * lo + u·(hi−lo) with u = uniformDraw("seed:t:p"). Degenerate borders
    * (lo == hi) pin the param — the reference does the same for params the
    * user excludes from `param_borders` (optuna_mixin.py:120-128). */
  def draws(borders: Map[String, (Double, Double)], budget: Int,
      seed: Long): Seq[Map[String, Double]] =
    (0 until budget).map { t =>
      borders.map { case (p, (lo, hi)) =>
        require(hi >= lo, s"invalid borders for $p: [$lo, $hi]")
        p -> (lo + uniformDraw(s"$seed:$t:$p") * (hi - lo))
      }
    }

  private[metrics] def evaluate(
      params: Map[String, Double],
      build: Map[String, Double] => graft.models.BaseRecommender,
      train: DataFrame, gt: DataFrame,
      metric: String, k: Int, cols: RecCols): Trial = {
    val recs = build(params).fitPredict(train, k)
    val score = Metrics.compute(recs, gt, Seq(metric), Seq(k), Descriptor.Mean, cols)
      .first().getDouble(0)
    Trial(params, score)
  }

  /** Evaluate the full budget on the full train split. Trials return in
    * DRAW order (not score order) so downstream consumers — and the SQL
    * oracle — address trials by index; use [[best]] for the winner. */
  def search(
      borders: Map[String, (Double, Double)],
      build: Map[String, Double] => graft.models.BaseRecommender,
      train: DataFrame, test: DataFrame,
      metric: String = "ndcg", k: Int = 10,
      budget: Int = 10, seed: Long = 42,
      cols: RecCols = RecCols(), parallelism: Int = 1,
  ): Seq[Trial] = {
    val gt = test.select(cols.query, cols.item).distinct()
    GridSearch.mapTrials(draws(borders, budget, seed), parallelism)(
      evaluate(_, build, train, gt, metric, k, cols))
  }

  def best(trials: Seq[Trial]): Trial = trials.maxBy(_.score)

  /** Optimize a (main, fallback) model pair the way the reference's
    * Fallback scenario does (scenarios/fallback.py:125-178): each model
    * searches its OWN borders with the same budget, independently, scored
    * by the same metric on the same split. Returns both winners; None for
    * the fallback when it has nothing to search (the reference skips
    * models with an empty search space). */
  def optimizeFallback(
      mainBorders: Map[String, (Double, Double)],
      fallbackBorders: Map[String, (Double, Double)],
      buildMain: Map[String, Double] => graft.models.BaseRecommender,
      buildFallback: Map[String, Double] => graft.models.BaseRecommender,
      train: DataFrame, test: DataFrame,
      metric: String = "ndcg", k: Int = 10,
      budget: Int = 10, seed: Long = 42,
      cols: RecCols = RecCols(),
  ): (Trial, Option[Trial]) = {
    val main = best(search(mainBorders, buildMain, train, test,
      metric, k, budget, seed, cols))
    val fb =
      if (fallbackBorders.isEmpty) None
      else Some(best(search(fallbackBorders, buildFallback, train, test,
        metric, k, budget, seed, cols)))
    (main, fb)
  }

  /** ADAPTIVE sampler — deterministic TPE-lite (round 11; reference:
    * models/optimization/optuna_mixin.py:17-244, Optuna's TPESampler).
    * Like TPE, past trials are split into a good set (top ⌈γ·n⌉ by score)
    * and a bad set, candidate values are drawn, and the candidate with the
    * best good-density/bad-density ratio wins. Two deliberate deviations
    * keep every arithmetic step bit-replayable in a SQL oracle (the
    * property TPE's KDE machinery cannot give):
    *
    *  1. all randomness is the seeded md5 draw (startup trials reuse the
    *     exact [[RandomSearch]] sequence `seed:t:p`; candidates draw from
    *     `seed:t:p:c`), so the trial sequence is a pure function of the
    *     seed and the past scores;
    *  2. densities use the MAX of CAUCHY kernels (nearest-neighbour
    *     density, l(x) = max_g 1/(1+((x−g)/bw)²)) instead of a Gaussian
    *     KDE sum — max is float-order-independent and the rational
    *     kernel needs no transcendental (exp is not correctly-rounded-
    *     mandated, so Java and a SQL engine may differ in the last ulp;
    *     +,·,/ are IEEE-exact everywhere), so a SQL engine reproduces
    *     every proposal bit-for-bit; at the tens-of-trials budgets the
    *     reference defaults to, nearest-good vs nearest-bad is within
    *     noise of the sum (spec: beats random search on planted optima).
    *
    * Params are proposed independently per dimension (TPE is factorized
    * the same way); degenerate borders pin the param. */
  object Tpe {
    /** gamma: good-set fraction; bwFraction: kernel bandwidth as a
      * fraction of the border width; nCandidates: draws per adaptive
      * proposal (even index = uniform exploration, odd index = a
      * perturbation of a good point — TPE samples candidates from l(x),
      * and the perturbation is its deterministic stand-in); nStartup:
      * pure-random warmup trials. */
    final case class Config(nStartup: Int = 2, nCandidates: Int = 8,
        gamma: Double = 0.25, bwFraction: Double = 0.2)

    /** Propose params for trial `t` given past scored trials — a pure
      * deterministic function of (seed, t, past). */
    def propose(borders: Map[String, (Double, Double)], seed: Long, t: Int,
        past: Seq[Trial], cfg: Config = Config()): Map[String, Double] = {
      borders.foreach { case (p, (lo, hi)) =>
        require(hi >= lo, s"invalid borders for $p: [$lo, $hi]") }
      if (t < cfg.nStartup || past.size < 2)
        borders.map { case (p, (lo, hi)) =>
          p -> (lo + uniformDraw(s"$seed:$t:$p") * (hi - lo)) }
      else {
        // rank past by (score desc, trial index asc) — deterministic ties
        val ranked = past.zipWithIndex
          .sortBy { case (tr, i) => (-tr.score, i) }.map(_._1)
        val nGood = math.max(1, math.ceil(cfg.gamma * past.size).toInt)
        val (good, bad) = (ranked.take(nGood), ranked.drop(nGood))
        borders.map { case (p, (lo, hi)) =>
          if (hi == lo) p -> lo
          else {
            val bw = (hi - lo) * cfg.bwFraction
            // perturbation radius SHRINKS as evidence accumulates
            // (bw / trial-age): early adaptive trials explore a good
            // point's whole neighbourhood, late ones refine it finely —
            // a pure function of t, so the SQL oracle replays it
            val radius = bw / (t - cfg.nStartup + 1)
            def kernel(x: Double, at: Double): Double = {
              val r = (x - at) / bw; 1.0 / (1.0 + r * r)
            }
            val best = (0 until cfg.nCandidates).map { c =>
              val u = uniformDraw(s"$seed:$t:$p:$c")
              val x =
                if (c % 2 == 0) lo + u * (hi - lo) // explore: uniform
                else { // exploit: perturb a good point within ±radius
                  val center = good((c / 2) % good.size).params(p)
                  math.min(hi, math.max(lo, center + (2.0 * u - 1.0) * radius))
                }
              val l = good.iterator.map(g => kernel(x, g.params(p))).max
              val b = bad.iterator.map(g => kernel(x, g.params(p)))
                .foldLeft(0.0)(math.max) + 1e-9
              (x, l / b, c)
            }.maxBy { case (_, ratio, c) => (ratio, -c) } // ties → lowest c
            p -> best._1
          }
        }
      }
    }

    /** Budgeted adaptive search of an arbitrary objective (maximized).
      * Trials return in DRAW order so consumers — and the SQL oracle —
      * address them by index; [[best]] picks the winner. Sequential by
      * construction: trial t's proposal depends on trials < t (the
      * adaptive trade-off vs [[RandomSearch]]'s embarrassing
      * parallelism). */
    def searchObjective(borders: Map[String, (Double, Double)],
        objective: Map[String, Double] => Double,
        budget: Int = 10, seed: Long = 42,
        cfg: Config = Config()): Seq[Trial] = {
      var past = Vector.empty[Trial]
      for (t <- 0 until budget) {
        val params = propose(borders, seed, t, past, cfg)
        past :+= Trial(params, objective(params))
      }
      past
    }

    /** model.optimize parity (optuna_mixin.py:167-244): fit-predict each
      * proposal and score `metric@k` on the holdout, adaptively. */
    def search(borders: Map[String, (Double, Double)],
        build: Map[String, Double] => graft.models.BaseRecommender,
        train: DataFrame, test: DataFrame,
        metric: String = "ndcg", k: Int = 10,
        budget: Int = 10, seed: Long = 42,
        cols: RecCols = RecCols(), cfg: Config = Config()): Seq[Trial] = {
      val gt = test.select(cols.query, cols.item).distinct()
      searchObjective(borders,
        params => evaluate(params, build, train, gt, metric, k, cols).score,
        budget, seed, cfg)
    }
  }

  /** Successive halving (Jamieson & Talwalkar, AISTATS 2016) over the same
    * draw sequence: rung r scores the surviving trials on a hash-sampled
    * fraction 1/eta^(R−1−r) of training QUERIES (sampling whole users keeps
    * every survivor's per-user history intact — item-row sampling would
    * bias history-dependent models), keeps the top ceil(n/eta), and the
    * final rung runs on the full split. B trials cost ≈ Σ n_r·frac_r ≈
    * B·(R/eta^(R-1) amortized) full fits instead of B — the budget knob a
    * user tuning 3+ params needs. With one rung (budget < eta) this
    * degenerates to exactly [[search]]. */
  def successiveHalving(
      borders: Map[String, (Double, Double)],
      build: Map[String, Double] => graft.models.BaseRecommender,
      train: DataFrame, test: DataFrame,
      metric: String = "ndcg", k: Int = 10,
      budget: Int = 10, eta: Int = 2, seed: Long = 42,
      cols: RecCols = RecCols(), parallelism: Int = 1,
  ): Seq[Trial] = {
    require(eta >= 2, s"eta must be >= 2, got $eta")
    val rungs = math.max(1,
      (math.log(budget.toDouble) / math.log(eta.toDouble)).floor.toInt + 1)
    val gt = test.select(cols.query, cols.item).distinct()
    var live = draws(borders, budget, seed)
    var scored: Seq[Trial] = Nil
    for (r <- 0 until rungs if live.nonEmpty) {
      val frac = 1.0 / math.pow(eta.toDouble, (rungs - 1 - r).toDouble)
      // xxhash64, not the portable md5: rung sampling has no SQL oracle to
      // mirror, and at full-corpus scale a per-row md5 would tax every
      // rung; xxhash64 keeps the only property needed — deterministic,
      // layout-independent query selection
      val tr =
        if (frac >= 1.0) train
        else train.filter(
          graft.core.PortableHash.uniformFast(seed, F.col(cols.query)) < frac)
      scored = GridSearch.mapTrials(live, parallelism)(
        evaluate(_, build, tr, gt, metric, k, cols))
      if (r < rungs - 1) {
        val keep = math.max(1, math.ceil(live.size.toDouble / eta).toInt)
        live = scored.sortBy(-_.score).take(keep).map(_.params)
      }
    }
    scored.sortBy(-_.score)
  }
}
