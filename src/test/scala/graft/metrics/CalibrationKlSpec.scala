package graft.metrics

import graft.SparkSpec

class CalibrationKlSpec extends SparkSpec {
  import spark.implicits._

  private def cats = Seq((1L, "A"), (2L, "B")).toDF("item_id", "category")

  test("hand golden: Steck C_KL in floor-ppm terms") {
    // u1 history {1,2} → p = {A:.5, B:.5}; recs {1} → q = {A:1}
    // term_A = floor(.5·ln(.5/(.99·1+.01·.5))·1e6) = −344068
    // term_B = floor(.5·ln(.5/(.99·0+.01·.5))·1e6) = 2302585
    val hist = Seq((1L, 1L), (1L, 2L)).toDF("query_id", "item_id")
    val recs = Seq((1L, 1L)).toDF("query_id", "item_id")
    val out = Metrics.calibrationDivergence(recs, hist, cats)
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 1958517L, 1958517L)))
  }

  test("a perfectly calibrated list scores 0; rec-less users are dropped") {
    val hist = Seq((1L, 1L), (1L, 2L), (9L, 1L)).toDF("query_id", "item_id")
    val recs = Seq((1L, 1L), (1L, 2L)).toDF("query_id", "item_id")
    // u1: q = p → q̃ = p → every term ln(1) = 0; u9 has no recs → dropped
    val out = Metrics.calibrationDivergence(recs, hist, cats)
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 0L, 0L)))
  }

  test("uncategorized items drop from both distributions") {
    val hist = Seq((1L, 1L), (1L, 2L), (1L, 777L)).toDF("query_id", "item_id")
    val recs = Seq((1L, 1L), (1L, 2L), (1L, 777L)).toDF("query_id", "item_id")
    val out = Metrics.calibrationDivergence(recs, hist, cats)
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 0L, 0L)))
  }
}
