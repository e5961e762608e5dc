package graft.models

import graft.SparkSpec

class RerankSpec extends SparkSpec {
  import spark.implicits._

  test("hand golden: diversity penalty reorders a redundant list") {
    // u1 pool: A=1 (rel .9), B=2 (rel .8), C=3 (rel .5);
    // B is a near-duplicate of A (sim 1.0), C is unrelated
    val pool = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (1L, 3L, 0.5))
      .toDF("query_id", "item_id", "rating")
    val sim = Seq((2L, 1L, 1.0), (1L, 2L, 1.0))
      .toDF("item_one", "item_two", "similarity")
    val out = Rerank.mmr(pool, sim, k = 3, lambda = 0.5)
      .orderBy("position").as[(Long, Long, Double, Long)].collect().toSeq
    // step1: A (.45); step2: B = .5·.8−.5·1 = −.1 vs C = .25 → C;
    // step3: B at −.1 (penalty vs {A, C} is max(sim(B,A), sim(B,C)) = 1)
    assert(out == Seq((1L, 1L, 0.45, 1L), (1L, 3L, 0.25, 2L),
      (1L, 2L, -0.1, 3L)))
  }

  test("lambda = 1 reduces to pure relevance order") {
    val pool = Seq((1L, 1L, 0.9), (1L, 2L, 0.8), (1L, 3L, 0.5))
      .toDF("query_id", "item_id", "rating")
    val sim = Seq((2L, 1L, 1.0)).toDF("item_one", "item_two", "similarity")
    val out = Rerank.mmr(pool, sim, k = 3, lambda = 1.0)
      .orderBy("position").select("item_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("short pools exhaust gracefully; ties break by item id") {
    val pool = Seq((1L, 5L, 0.5), (1L, 4L, 0.5), (2L, 9L, 0.1))
      .toDF("query_id", "item_id", "rating")
    val sim = Seq.empty[(Long, Long, Double)]
      .toDF("item_one", "item_two", "similarity")
    val out = Rerank.mmr(pool, sim, k = 3, lambda = 0.5)
      .orderBy("query_id", "position")
      .select("query_id", "item_id", "position")
      .as[(Long, Long, Long)].collect().toSeq
    // u1 gets its 2 items (tie → item 4 first), u2 its single item;
    // nobody invents a 3rd row
    assert(out == Seq((1L, 4L, 1L), (1L, 5L, 2L), (2L, 9L, 1L)))
  }
  test("calibrated: hand golden — relevance wins step 1, calibration step 2") {
    // history {i1:A, i3:B} → p = {A:.5, B:.5}; pool {i2:A rel .9, i4:B rel .5}
    val cats = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("item_id", "category")
    val hist = Seq((1L, 1L), (1L, 3L)).toDF("query_id", "item_id")
    val pool = Seq((1L, 2L, 0.9), (1L, 4L, 0.5))
      .toDF("query_id", "item_id", "rating")
    val out = Rerank.calibrated(pool, hist, cats, k = 2, lambda = 0.5)
      .orderBy("position").as[(Long, Long, Double, Long)].collect().toSeq
    // step1 i2: KL({.5,.5} ‖ {~1,~0}) = 1958517773625 ppt →
    //   score = .5·.9 − .5·1.958517773625 = −0.529258887 (beats i4's rel)
    // step2 i4: list {A,B} matches p exactly → KL 0 → score .25
    assert(out == Seq((1L, 2L, -0.529258887, 1L), (1L, 4L, 0.25, 2L)))
  }

  test("calibrated: a calibration-matching candidate beats higher relevance at λ=.9") {
    // u history 3:1 towards A; pool: high-rel B item vs lower-rel A item —
    // heavy λ weights calibration, so the A item wins step 1
    val cats = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (10L, "A"), (11L, "B")).toDF("item_id", "category")
    val hist = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
      .toDF("query_id", "item_id")
    val pool = Seq((1L, 10L, 0.1), (1L, 11L, 0.9))
      .toDF("query_id", "item_id", "rating")
    val first = Rerank.calibrated(pool, hist, cats, k = 1, lambda = 0.9)
      .select("item_id").as[Long].head()
    assert(first == 10L)
    // ...and λ=0 is pure relevance
    val rel = Rerank.calibrated(pool, hist, cats, k = 1, lambda = 0.0)
      .select("item_id").as[Long].head()
    assert(rel == 11L)
  }
}
