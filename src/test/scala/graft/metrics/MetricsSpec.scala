package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  // one user, pred ranked [1,2,3], gt {2}: golden values mirror the
  // reference kernels (ScalaPySparkUDFs.scala)
  def frame = Seq((0L, Seq(1L, 2L, 3L), Seq(2L))).toDF("query_id", "pred", "gt")

  def eval(name: String, k: Int): Double =
    frame.select(Metrics.kernel(name, F.col("pred"), F.col("gt"), k).as("v"))
      .first().getDouble(0)

  test("kernel golden values for pred=[1,2,3], gt={2}") {
    assert(eval("hit_rate", 2) == 1.0)
    assert(eval("hit_rate", 1) == 0.0)
    assert(eval("precision", 2) == 0.5)
    assert(eval("recall", 2) == 1.0)
    assert(eval("mrr", 2) == 0.5)
    assert(eval("map", 2) == 0.25)          // (1/2) / k=2
    assert(math.abs(eval("ndcg", 2) - 1.0 / (math.log(3) / math.log(2))) < 1e-12)
    assert(eval("roc_auc", 3) == 0.5)       // fpCum=1, fpCur=2, len=3
  }

  test("kernels return 0 on empty pred or gt") {
    val empty = Seq((0L, Seq.empty[Long], Seq(1L)),
      (1L, Seq(1L), Seq.empty[Long])).toDF("query_id", "pred", "gt")
    Metrics.RankingMetrics.foreach { m =>
      val vs = empty.select(Metrics.kernel(m, F.col("pred"), F.col("gt"), 3).as("v"))
        .as[Double].collect()
      assert(vs.forall(_ == 0.0), s"$m on empty inputs")
    }
  }

  test("enrich ranks by rating desc with item asc ties and right-joins gt") {
    val recs = Seq((0L, 10L, 1.0), (0L, 11L, 2.0), (0L, 12L, 2.0))
      .toDF("query_id", "item_id", "rating")
    val gt = Seq((0L, 11L), (7L, 99L)).toDF("query_id", "item_id")
    val e = Metrics.enrich(recs, gt).orderBy("query_id").collect()
    // user 0: [11, 12, 10] (2.0 ties broken by item asc)
    assert(e(0).getSeq[Long](2) == Seq(11L, 12L, 10L))
    // user 7 has gt but no recs → empty pred
    assert(e(1).getSeq[Long](2) == Seq.empty)
  }

  test("compute means over ground-truth users") {
    val recs = Seq((0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val gt = Seq((0L, 1L), (1L, 2L)).toDF("query_id", "item_id")
    val v = Metrics.compute(recs, gt, Seq("hit_rate"), Seq(1))
      .first().getDouble(0)
    assert(v == 0.5) // user 0 hits, user 1 has no recs
  }

  test("coverage counts recommended share of train items") {
    val recs = Seq((0L, 1L, 1.0), (1L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val train = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 3L, 1.0), (0L, 4L, 1.0))
      .toDF("query_id", "item_id", "rating")
    assert(Metrics.coverage(recs, train, 5).first().getDouble(0) == 0.25)
  }

  test("novelty is the unseen share of recs") {
    val recs = Seq((0L, 1L, 2.0), (0L, 9L, 1.0)).toDF("query_id", "item_id", "rating")
    val train = Seq((0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    assert(Metrics.novelty(recs, train, 2).first().getDouble(0) == 0.5)
  }

  test("unexpectedness is 1 minus base overlap share") {
    val recs = Seq((0L, 1L, 2.0), (0L, 2L, 1.0)).toDF("query_id", "item_id", "rating")
    val base = Seq((0L, 1L, 2.0), (0L, 3L, 1.0)).toDF("query_id", "item_id", "rating")
    assert(Metrics.unexpectedness(recs, base, 2).first().getDouble(0) == 0.5)
  }

  test("ncisPrecision weights hits by position weight") {
    val df = Seq((0L, Seq(1L, 2L, 3L), Seq(0.5, 0.3, 0.2), Seq(2L)))
      .toDF("query_id", "pred", "w", "gt")
    val v = df.select(Kernels.ncisPrecision(F.col("pred"), F.col("w"),
      F.col("gt"), 2).as("v")).first().getDouble(0)
    assert(math.abs(v - 0.3 / 0.8) < 1e-12) // hit at pos 2, weights .5+.3
  }

  test("collectGuarded fails fast above the row limit") {
    import graft.core.Ops
    val df = spark.range(100).toDF("x")
    assert(Ops.collectGuarded(df, 1000).length == 100)
    intercept[IllegalArgumentException] { Ops.collectGuarded(df, 10) }
  }

  test("returnRecs materializes via cache+count") {
    import graft.core.Ops
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = Ops.returnRecs(df)
    assert(out.storageLevel.useMemory)
    out.unpersist()
  }

  test("Experiment.run records positive fit_pred_time per model") {
    import graft.models.PopRec
    val train = Seq((0L, 0L, 1.0), (1L, 0L, 1.0), (0L, 1L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val test = Seq((1L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val t = new Experiment(Seq("hit_rate"), Seq(1))
      .run(Map("pop" -> new PopRec()), train, test, k = 1)
      .table(spark)
    assert(t.columns.contains("fit_pred_time"))
    val secs = t.select("fit_pred_time").as[Double].first()
    assert(secs > 0.0 && secs < 600.0)
    // addResult without timing yields NaN, not a schema change
    val t2 = new Experiment(Seq("hit_rate"), Seq(1))
      .addResult("ext", test.select("query_id", "item_id", "rating"),
        test.select("query_id", "item_id"))
      .table(spark)
    assert(t2.select("fit_pred_time").as[Double].first().isNaN)
  }

  test("MedianApprox tracks the exact median on small inputs") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val exact = vals.agg(Descriptor.Median(F.col("v"))).first().getDouble(0)
    val approx = vals.agg(Descriptor.MedianApprox()(F.col("v"))).first().getDouble(0)
    // sketch is exact below its accuracy threshold; 3.0 either way
    assert(exact == 3.0 && approx == 3.0)
  }

  test("itemDistribution: outer join of log vs rec exposure, zero-filled") {
    val log = Seq(
      (0L, 10L, 1.0), (1L, 10L, 1.0), (0L, 10L, 2.0), // item 10: 2 users
      (0L, 20L, 1.0),                                 // item 20: 1 user, never recommended
    ).toDF("query_id", "item_id", "rating")
    val recs = Seq(
      (0L, 10L, 5.0), (1L, 30L, 4.0), // item 30 recommended but not in log
    ).toDF("query_id", "item_id", "rating")
    val got = Metrics.itemDistribution(log, recs, k = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 2L, 1L), (20L, 1L, 0L), (30L, 0L, 1L)))
  }

  test("GridSearch ranks the better hyper-parameter first") {
    import graft.models.{PopRec, Wilson, BaseRecommender}
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 0L))
      .map { case (q, i) => (q, i, 1.0) }
      .toDF("query_id", "item_id", "rating")
    // "z" selects between two model shapes; just verifies plumbing + order
    val trials = GridSearch.search(
      Map("useRating" -> Seq(0.0, 1.0)),
      p => if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec(),
      train, test, metric = "hit_rate", k = 2)
    assert(trials.length == 2)
    assert(trials.head.score >= trials.last.score) // sorted best-first
    val grid = GridSearch.grid(Map("a" -> Seq(1.0, 2.0), "b" -> Seq(3.0)))
    assert(grid.toSet == Set(Map("a" -> 1.0, "b" -> 3.0), Map("a" -> 2.0, "b" -> 3.0)))
  }

  test("RandomSearch draws are deterministic, in-bounds, and pin degenerate borders") {
    val d1 = RandomSearch.draws(Map("z" -> (1.0, 2.0), "c" -> (5.0, 5.0)), 4, seed = 7)
    val d2 = RandomSearch.draws(Map("z" -> (1.0, 2.0), "c" -> (5.0, 5.0)), 4, seed = 7)
    assert(d1 == d2)                                   // same seed → same sequence
    assert(d1.forall(p => p("z") >= 1.0 && p("z") < 2.0))
    assert(d1.forall(p => p("c") == 5.0))              // lo == hi pins the param
    assert(d1.map(_("z")).distinct.size == 4)          // draws actually vary
    val d3 = RandomSearch.draws(Map("z" -> (1.0, 2.0)), 4, seed = 8)
    assert(d3.map(_("z")) != d1.map(_("z")))           // seed matters
    // driver-side md5 recipe == the Spark PortableHash column recipe
    val sparkU = spark.range(1).select(
      graft.core.PortableHash.uniform(7L,
        org.apache.spark.sql.functions.lit(0),
        org.apache.spark.sql.functions.lit("z"))).first().getDouble(0)
    assert(RandomSearch.uniformDraw("7:0:z") == sparkU)
  }

  test("RandomSearch with degenerate borders reproduces the grid-point score") {
    import graft.models.PopRec
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 0L))
      .map { case (q, i) => (q, i, 1.0) }
      .toDF("query_id", "item_id", "rating")
    def build(p: Map[String, Double]) =
      if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec()
    val gridScore = GridSearch.search(Map("useRating" -> Seq(1.0)),
      build, train, test, metric = "hit_rate", k = 2).head.score
    // borders pinned at the same grid point: every budgeted trial must
    // reproduce the grid result exactly
    val rs = RandomSearch.search(Map("useRating" -> (1.0, 1.0)),
      build, train, test, metric = "hit_rate", k = 2, budget = 2, seed = 3)
    assert(rs.length == 2 && rs.forall(_.score == gridScore))
  }

  test("optimizeFallback searches each model's borders independently") {
    import graft.models.{PopRec, Wilson}
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 0L))
      .map { case (q, i) => (q, i, 1.0) }
      .toDF("query_id", "item_id", "rating")
    val (main, fb) = RandomSearch.optimizeFallback(
      mainBorders = Map("useRating" -> (0.0, 1.0)),
      fallbackBorders = Map("z" -> (1.0, 2.0)),
      buildMain = p =>
        if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec(),
      buildFallback = p => new Wilson(z = p("z")),
      train = train, test = test, metric = "hit_rate", k = 2,
      budget = 2, seed = 5)
    assert(main.params.contains("useRating") && fb.get.params.contains("z"))
    // winner = best of that model's own trial sequence
    val mainTrials = RandomSearch.search(Map("useRating" -> (0.0, 1.0)),
      p => if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec(),
      train, test, metric = "hit_rate", k = 2, budget = 2, seed = 5)
    assert(main.score == mainTrials.map(_.score).max)
    // an empty fallback space is skipped, reference-style
    val (_, none) = RandomSearch.optimizeFallback(
      Map("useRating" -> (0.0, 1.0)), Map.empty,
      p => new PopRec(), p => new Wilson(),
      train, test, metric = "hit_rate", k = 2, budget = 1, seed = 5)
    assert(none.isEmpty)
  }

  test("Tpe: deterministic, startup reuses the RandomSearch sequence, bounds hold") {
    import RandomSearch.Tpe
    val borders = Map("z" -> (1.0, 2.0), "c" -> (5.0, 5.0))
    def obj(p: Map[String, Double]) = -(p("z") - 1.3) * (p("z") - 1.3)
    val t1 = Tpe.searchObjective(borders, obj, budget = 8, seed = 7)
    val t2 = Tpe.searchObjective(borders, obj, budget = 8, seed = 7)
    assert(t1 == t2) // fully deterministic
    assert(t1.size == 8)
    assert(t1.forall(t => t.params("z") >= 1.0 && t.params("z") < 2.0))
    assert(t1.forall(_.params("c") == 5.0)) // degenerate border pinned
    // startup trials are EXACTLY the RandomSearch draw sequence
    val rnd = RandomSearch.draws(borders, 2, seed = 7)
    assert(t1.take(2).map(_.params) == rnd)
    // adaptive trials depart from the random sequence (they use the scores)
    val rndFull = RandomSearch.draws(borders, 8, seed = 7)
    assert(t1.map(_.params("z")) != rndFull.map(_("z")))
  }

  test("Tpe beats random search on planted optima at equal budget") {
    import RandomSearch.Tpe
    // 12 (seed, optimum) pairs; budget 16 each; objective peaked at zstar.
    // All arithmetic is seeded md5 — this is a fixed, reproducible
    // comparison, not a flaky statistical one. Dominance claim: higher
    // mean best-score, at least 3× more wins than losses, and any loss
    // is a near-tie (random occasionally lands a lucky draw ON the
    // optimum; no sampler beats luck pointwise).
    val cases = for (seed <- Seq(1L, 2L, 3L, 4L); zs <- Seq(1.15, 1.5, 1.85))
      yield (seed, zs)
    val outcomes = cases.map { case (seed, zstar) =>
      def obj(p: Map[String, Double]) = {
        val d = p("z") - zstar; math.exp(-50.0 * d * d)
      }
      val tpe = Tpe.searchObjective(Map("z" -> (1.0, 2.0)), obj,
        budget = 16, seed = seed).map(_.score).max
      val rnd = RandomSearch.draws(Map("z" -> (1.0, 2.0)), 16, seed = seed)
        .map(p => obj(p)).max
      (tpe, rnd)
    }
    val wins = outcomes.count { case (t, r) => t > r }
    val losses = outcomes.count { case (t, r) => t < r }
    assert(outcomes.map(_._1).sum > outcomes.map(_._2).sum,
      s"TPE mean did not beat random: $outcomes")
    assert(wins >= 3 * math.max(losses, 1) || losses == 0,
      s"TPE wins $wins vs losses $losses: $outcomes")
    assert(outcomes.forall { case (t, r) => t >= r - 0.05 },
      s"a TPE loss exceeded the near-tie margin: $outcomes")
  }

  test("Tpe.search (model-based) with pinned borders reproduces the grid point") {
    import graft.models.PopRec
    import RandomSearch.Tpe
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 0L))
      .map { case (q, i) => (q, i, 1.0) }
      .toDF("query_id", "item_id", "rating")
    def build(p: Map[String, Double]) =
      if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec()
    val gridScore = GridSearch.search(Map("useRating" -> Seq(1.0)),
      build, train, test, metric = "hit_rate", k = 2).head.score
    val tpe = Tpe.search(Map("useRating" -> (1.0, 1.0)), build, train, test,
      metric = "hit_rate", k = 2, budget = 3, seed = 3)
    assert(tpe.length == 3 && tpe.forall(_.score == gridScore))
  }

  test("successive halving with a single rung equals plain random search") {
    import graft.models.PopRec
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 0L))
      .map { case (q, i) => (q, i, 1.0) }
      .toDF("query_id", "item_id", "rating")
    def build(p: Map[String, Double]) =
      if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec()
    // budget 3 < eta 4 → one rung at frac 1.0 → same trials as search
    val sh = RandomSearch.successiveHalving(Map("useRating" -> (0.0, 1.0)),
      build, train, test, metric = "hit_rate", k = 2, budget = 3, eta = 4, seed = 5)
    val rs = RandomSearch.search(Map("useRating" -> (0.0, 1.0)),
      build, train, test, metric = "hit_rate", k = 2, budget = 3, seed = 5)
    assert(sh.map(t => (t.params, t.score)).toSet ==
      rs.map(t => (t.params, t.score)).toSet)
    assert(sh.head.score == sh.map(_.score).max) // sorted best-first
    // multi-rung halving: final survivors are scored on the FULL split and
    // the winner's params come from the same deterministic draw sequence
    val sh2 = RandomSearch.successiveHalving(Map("useRating" -> (0.0, 1.0)),
      build, train, test, metric = "hit_rate", k = 2, budget = 4, eta = 2, seed = 5)
    val drawn = RandomSearch.draws(Map("useRating" -> (0.0, 1.0)), 4, seed = 5).toSet
    assert(sh2.nonEmpty && sh2.forall(t => drawn.contains(t.params)))
  }

  test("parallel trials equal sequential trials, value-for-value and in order") {
    import graft.models.PopRec
    val train = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0),
      (0L, 2L, 1.0), (1L, 2L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val test = Seq((0L, 1L, 1.0), (1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 0L, 1.0))
      .toDF("query_id", "item_id", "rating")
    def build(p: Map[String, Double]) =
      if (p("useRating") > 0.5) new PopRec(useRating = true) else new PopRec()
    val seq = RandomSearch.search(Map("useRating" -> (0.0, 1.0)), build,
      train, test, metric = "hit_rate", k = 2, budget = 4, seed = 5)
    val par = RandomSearch.search(Map("useRating" -> (0.0, 1.0)), build,
      train, test, metric = "hit_rate", k = 2, budget = 4, seed = 5,
      parallelism = 4)
    // identical trials in identical DRAW order — concurrency is
    // wall-clock-only (the grid_search_budget oracle depends on this)
    assert(par.map(t => (t.params, t.score)) ==
      seq.map(t => (t.params, t.score)))
  }

  private def ci(rows: Seq[(Long, Double)], resamples: Int = 100,
      seed: Long = 7L, parts: Int = 4): (Long, Long, Long, Long) =
    Metrics.bootstrapCI(rows.toDF("id", "metric").repartition(parts),
        "id", "metric", resamples, seed)
      .as[(Long, Long, Long, Long)].head()

  test("bootstrapCI: constant metric collapses to a zero-width interval") {
    val r = ci((1L to 50L).map(i => (i, 0.42)))
    assert(r == ((420000L, 420000L, 420000L, 100L)))
  }

  test("bootstrapCI: bounds bracket the point estimate and are ordered") {
    val rows = (1L to 80L).map(i => (i, (i % 10).toDouble / 10.0))
    val (mean, lo, hi, n) = ci(rows)
    assert(n == 100L)
    assert(lo <= mean && mean <= hi, s"($lo, $mean, $hi)")
    assert(lo < hi) // heterogeneous metric: resampling must spread
  }

  test("bootstrapCI: deterministic across layouts, seed moves the draws") {
    val rows = (1L to 60L).map(i => (i, (i % 7).toDouble / 7.0))
    val a = ci(rows, parts = 1)
    assert(a == ci(rows, parts = 13))
    val b = ci(rows, seed = 8L)
    assert(a._1 == b._1) // point estimate is draw-free
    assert((a._2, a._3) != ((b._2, b._3)), "different draws, same bounds")
  }

  test("bootstrapCI: interval narrows with more entities (consistency)") {
    def width(n: Int) = {
      val r = ci((1L to n.toLong).map(i => (i, (i % 10).toDouble / 10.0)),
        resamples = 200)
      r._3 - r._2
    }
    assert(width(400) < width(25), s"${width(400)} !< ${width(25)}")
  }

  test("computeWithCI is exactly bootstrapCI over the per-user frame") {
    val recs = Seq((0L, 1L, 1.0), (0L, 2L, 0.5), (1L, 3L, 1.0), (2L, 4L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val gt = Seq((0L, 1L), (1L, 9L), (2L, 4L)).toDF("query_id", "item_id")
    val direct = Metrics.computeWithCI(recs, gt, "hit_rate", 2, 100, 7L)
      .as[(Long, Long, Long, Long)].head()
    val manual = Metrics.bootstrapCI(
        Metrics.perUser(recs, gt, Seq("hit_rate"), Seq(2)),
        "query_id", "hit_rate_at_2", 100, 7L)
      .as[(Long, Long, Long, Long)].head()
    assert(direct == manual)
    // 2 of 3 gt users hit → point estimate 2/3 in ppm
    assert(direct._1 == 666666L)
  }

  test("bootstrapCI: parameter contracts") {
    intercept[IllegalArgumentException](ci(Seq((1L, 0.5)), resamples = 5))
    intercept[IllegalArgumentException] {
      Metrics.bootstrapCI(Seq((1L, 0.5)).toDF("id", "metric"), "id",
        "metric", 100, 7L, alphaPermille = 600)
    }
  }

  test("ratingErrors: hand golden MAE/RMSE in exact ppm") {
    // errors: +1e6 and −2e6 → mae 1.5e6, rmse floor(sqrt(2.5e12)) = 1581138
    val scored = Seq((4.0, 3.0), (1.0, 3.0)).toDF("pred", "actual")
    assert(Metrics.ratingErrors(scored, "pred", "actual")
      .as[(Long, Long, Long)].head() == ((2L, 1500000L, 1581138L)))
    // perfect predictor → zero error
    val perfect = Seq((2.5, 2.5), (4.0, 4.0)).toDF("pred", "actual")
    assert(Metrics.ratingErrors(perfect, "pred", "actual")
      .as[(Long, Long, Long)].head() == ((2L, 0L, 0L)))
  }

  test("spearmanPpm: identity 1e6, reversal -1e6, non-common keys ignored") {
    val a = Seq((1L, 10L), (2L, 8L), (3L, 5L), (4L, 1L), (9L, 99L))
      .toDF("item_id", "score")
    val same = Seq((1L, 10L), (2L, 8L), (3L, 5L), (4L, 1L), (8L, 7L))
      .toDF("item_id", "score")
    val rev = Seq((1L, 1L), (2L, 5L), (3L, 8L), (4L, 10L))
      .toDF("item_id", "score")
    assert(Metrics.spearmanPpm(a, same, "item_id", "score")
      .as[(Long, Long)].head() == ((4L, 1000000L)))
    assert(Metrics.spearmanPpm(a, rev, "item_id", "score")
      .as[(Long, Long)].head() == ((4L, -1000000L)))
  }

  test("spearmanPpm: ties break by key; n < 2 yields NULL rho") {
    // both frames tie all scores → both rankings fall to key order → rho 1
    val t1 = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("item_id", "score")
    val t2 = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("item_id", "score")
    assert(Metrics.spearmanPpm(t1, t2, "item_id", "score")
      .as[(Long, Long)].head() == ((3L, 1000000L)))
    val single = Seq((1L, 5L)).toDF("item_id", "score")
    val row = Metrics.spearmanPpm(single, single, "item_id", "score")
      .collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(1))
  }

  test("calibrationBins: hand golden — exact ppm conf/acc/gap per bin") {
    // bin 0: probs .0/.05 (ppm 0, 50000), labels 0,1 → conf 25000, acc 500000
    // bin 9: probs .95/1.0 (950000, 1000000), labels 1,1 → conf 975000, acc 1000000
    val scored = Seq(
      (0.0, false), (0.05, true), (0.95, true), (1.0, true),
    ).toDF("prob", "label")
    assertSameRows(Metrics.calibrationBins(scored, "prob", "label", 10),
      Seq((0L, 2L, 25000L, 500000L, 475000L),
          (9L, 2L, 975000L, 1000000L, 25000L)))
  }

  test("calibrationBins: probs clamp into [0,1] and 1.0 lands in the top bin") {
    val scored = Seq((-0.3, false), (1.7, true), (1.0, true))
      .toDF("prob", "label")
    val bins = Metrics.calibrationBins(scored, "prob", "label", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bins == Map(0L -> 1L, 9L -> 2L))
  }

  test("calibrationEce: bin-weighted mean gap, perfect scorer → 0") {
    val scored = Seq(
      (0.0, false), (0.05, true), (0.95, true), (1.0, true),
    ).toDF("prob", "label")
    val ece = Metrics.calibrationEce(scored, "prob", "label", 10)
      .as[(Long, Long, Long)].head()
    // (2·475000 + 2·25000) div 4 = 250000
    assert(ece == ((250000L, 475000L, 4L)))
    // a scorer whose per-bin confidence equals the positive rate has ECE 0
    val perfect = Seq((0.05, false), (0.05, false), (0.05, false),
      (0.05, false), (0.05, false), (0.05, false), (0.05, false),
      (0.05, false), (0.05, false), (0.05, false), (0.05, false),
      (0.05, false), (0.05, false), (0.05, false), (0.05, false),
      (0.05, false), (0.05, false), (0.05, false), (0.05, false),
      (0.05, true)).toDF("prob", "label")
    val e2 = Metrics.calibrationEce(perfect, "prob", "label", 10)
      .as[(Long, Long, Long)].head()
    assert(e2._1 == 0L && e2._3 == 20L)
  }
}
