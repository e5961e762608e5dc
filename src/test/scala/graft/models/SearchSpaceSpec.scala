package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}

/** Per-model default search spaces (reference `_search_space` — als.py:22,
  * knn.py:32, slim.py:29, word2vec.py:52, random_rec.py:123,
  * association_rules.py:110): `model.optimize(train, test)` with no
  * borders must reproduce optimize with the model's own borders passed
  * explicitly, and the param decoding must respect each space's bounds
  * and types.
  */
class SearchSpaceSpec extends SparkSpec {
  import spark.implicits._

  def log: DataFrame = (0L until 12L).flatMap { q =>
    (0L until 6L).filter(i => (q + i) % 3 != 0).map(i =>
      (q, i, 1.0 + (q * 7 + i * 3) % 5, s"2024-01-0${(i % 7) + 1} 10:00:00"))
  }.toDF("query_id", "item_id", "rating", "timestamp")
    .withColumn("timestamp", F.to_timestamp($"timestamp"))

  private val trainDf = log.filter($"item_id" < 5)
  private val testDf = log.filter($"item_id" >= 5)

  test("optimize without borders == optimize with explicit default borders") {
    val models = Seq[BaseRecommender](
      new ItemKNN(numNeighbours = 5),
      new RandomRec("popular", seed = 1),
      new SLIM(maxIter = 5),
    )
    for (m <- models) {
      val auto = m.optimize(trainDf, testDf, budget = 3, seed = 7)
      val explicit = m.optimize(trainDf, testDf,
        paramBorders = Some(m.searchBorders), budget = 3, seed = 7)
      assert(auto.params == explicit.params && auto.score == explicit.score,
        s"${m.getClass.getSimpleName}: zero-config optimize diverged")
    }
  }

  test("every searchable model draws params inside its reference bounds") {
    val knn = new ItemKNN()
    val draws = graft.metrics.RandomSearch.draws(knn.searchBorders, 20, 42)
    for (d <- draws) {
      val m = knn.withParams(d)
      assert(m.numNeighbours >= 1 && m.numNeighbours <= 100)
      assert(m.shrink >= 0 && m.shrink <= 100)
      assert(Seq(None, Some("tf_idf"), Some("bm25")).contains(m.weighting))
    }
    val als = new ALSRec()
    for (d <- graft.metrics.RandomSearch.draws(als.searchBorders, 20, 42)) {
      val r = als.withParams(d).rank
      assert(r >= 8 && r <= 256, s"loguniform rank out of [8,256]: $r")
    }
    val slim = new SLIM()
    for (d <- graft.metrics.RandomSearch.draws(slim.searchBorders, 20, 42)) {
      val m = slim.withParams(d)
      assert(m.l2 >= 1e-6 && m.l2 <= 5.0 && m.l1 >= 1e-6 && m.l1 <= 2.0)
    }
    val rr = new RandomRec()
    for (d <- graft.metrics.RandomSearch.draws(rr.searchBorders, 20, 42)) {
      val m = rr.withParams(d)
      assert(Seq("popular", "relevance", "uniform").contains(m.distribution))
      assert(m.alpha >= -0.5 && m.alpha <= 100.0)
    }
    val w2v = new Word2VecRec()
    for (d <- graft.metrics.RandomSearch.draws(w2v.searchBorders, 5, 42)) {
      val m = w2v.withParams(d)
      assert(m.vectorSize >= 50 && m.vectorSize <= 300)
      assert(m.window >= 1 && m.window <= 100)
    }
    val ar = new AssociationRules()
    for (d <- graft.metrics.RandomSearch.draws(ar.searchBorders, 5, 42)) {
      val m = ar.withParams(d)
      assert(m.minItemCount >= 3 && m.minItemCount <= 10)
      assert(m.minPairCount >= 3 && m.minPairCount <= 10)
      assert(m.numNeighbours >= 300 && m.numNeighbours <= 2000)
    }
    // round-12/13 families (EASE λ, SlopeOne cap, BiasModel damping,
    // ContentKNN neighbours, Markov2 floor, P3alpha β/crop)
    val so = new SlopeOne()
    for (d <- graft.metrics.RandomSearch.draws(so.searchBorders, 10, 42)) {
      val m = so.withParams(d)
      assert(m.maxUserHistory >= 100 && m.maxUserHistory <= 2000)
    }
    val bm = new BiasModel()
    for (d <- graft.metrics.RandomSearch.draws(bm.searchBorders, 10, 42)) {
      val m = bm.withParams(d)
      assert(m.lambdaItem >= 0 && m.lambdaItem <= 100)
      assert(m.lambdaUser >= 0 && m.lambdaUser <= 100)
    }
    val ck = new ContentKNN()
    for (d <- graft.metrics.RandomSearch.draws(ck.searchBorders, 10, 42)) {
      val m = ck.withParams(d)
      assert(m.numNeighbours >= 1 && m.numNeighbours <= 100)
      assert(m.shrink >= 0 && m.shrink <= 100)
    }
    val m2 = new Markov2Rec()
    for (d <- graft.metrics.RandomSearch.draws(m2.searchBorders, 10, 42)) {
      val m = m2.withParams(d)
      assert(m.minCount >= 1 && m.minCount <= 10)
    }
    val ease = new Ease()
    for (d <- graft.metrics.RandomSearch.draws(ease.searchBorders, 10, 42)) {
      val m = ease.withParams(d)
      assert(m.lambda >= 1.0 && m.lambda <= 1e4, s"ln-space λ out: ${m.lambda}")
    }
    val p3 = new P3AlphaRec()
    for (d <- graft.metrics.RandomSearch.draws(p3.searchBorders, 10, 42)) {
      val m = p3.withParams(d)
      assert(m.beta >= 0 && m.beta <= 3)
      assert(m.topKNeighbours >= 10 && m.topKNeighbours <= 500)
    }
  }

  test("round-12 rating/sequential families run zero-config optimize end-to-end") {
    for (m <- Seq[BaseRecommender](new SlopeOne(), new BiasModel(),
        new Markov2Rec())) {
      val auto = m.optimize(trainDf, testDf, budget = 2, seed = 7)
      val explicit = m.optimize(trainDf, testDf,
        paramBorders = Some(m.searchBorders), budget = 2, seed = 7)
      assert(auto.params == explicit.params && auto.score == explicit.score,
        s"${m.getClass.getSimpleName}: zero-config optimize diverged")
    }
  }

  test("withParams inherits unmentioned config and never mutates the source") {
    val knn = new ItemKNN(numNeighbours = 42, maxUserHistory = 77)
    val tuned = knn.withParams(Map("shrink" -> 5.0))
    assert(tuned.numNeighbours == 42 && tuned.maxUserHistory == 77
      && tuned.shrink == 5.0)
    assert(knn.shrink == 0.0)
  }

  test("models without a search space fail fast on zero-config optimize") {
    intercept[IllegalArgumentException] {
      new PopRec().optimize(trainDf, testDf, budget = 2)
    }
  }

  test("optimize samplers: tpe default == Tpe.search best, random == RandomSearch best") {
    val m = new ItemKNN(numNeighbours = 5)
    val tpe = m.optimize(trainDf, testDf, budget = 4, seed = 7)
    val tpeTrials = graft.metrics.RandomSearch.Tpe.search(
      m.searchBorders, m.withParams, trainDf, testDf, budget = 4, seed = 7)
    assert(tpe == graft.metrics.RandomSearch.best(tpeTrials))
    val rnd = m.optimize(trainDf, testDf, budget = 4, seed = 7, sampler = "random")
    val rndTrials = graft.metrics.RandomSearch.search(
      m.searchBorders, m.withParams, trainDf, testDf, budget = 4, seed = 7)
    assert(rnd == graft.metrics.RandomSearch.best(rndTrials))
    intercept[IllegalArgumentException] {
      m.optimize(trainDf, testDf, budget = 2, sampler = "genetic")
    }
  }
}
