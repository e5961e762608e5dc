package graft.models

import graft.SparkSpec

class BiasModelSpec extends SparkSpec {
  import spark.implicits._

  // u1: (i1,5),(i2,1); u2: (i1,3) — N=3, Σ=9 → μ = 3,000,000 ppm
  private def log = Seq(
    (1L, 1L, 5.0, 10L), (1L, 2L, 1.0, 20L), (2L, 1L, 3.0, 30L),
  ).toDF("query_id", "item_id", "rating", "timestamp")

  test("hand golden: μ, item and user biases in exact ppm (λ=10)") {
    val m = new BiasModel().fit(log)
    assert(m.muPpm == 3000000L)
    // b_i1 = (8e6 − 2·3e6) div 12 = 166666; b_i2 = (1e6 − 3e6) div 11 = −181818
    assertSameRows(m.itemBias, Seq((1L, 166666L), (2L, -181818L)))
    // b_u1 = (6e6 − 6e6 − (166666 − 181818)) div 12 = 15152 div 12 = 1262
    // b_u2 = (3e6 − 3e6 − 166666) div 11 = −15151 (div truncates toward 0)
    assertSameRows(m.userBias, Seq((1L, 1262L), (2L, -15151L)))
  }

  test("predictPairs: μ + b_u + b_i, unknown entities fall back to bias 0") {
    val m = new BiasModel().fit(log)
    val pairs = Seq((2L, 2L), (2L, 99L), (99L, 1L)).toDF("query_id", "item_id")
    assertSameRows(m.predictPairs(pairs, log), Seq(
      (2L, 2L, 3000000L - 15151L - 181818L),
      (2L, 99L, 3000000L - 15151L),
      (99L, 1L, 3000000L + 166666L)))
  }

  test("incremental stats merge-law: ANY slicing rebuilds the full fit exactly") {
    val wide = log.unionAll(Seq(
      (1L, 1L, 4.0, 40L), (3L, 2L, 2.0, 50L), (3L, 3L, 5.0, 60L),
    ).toDF("query_id", "item_id", "rating", "timestamp"))
    val full = new BiasModel().fit(wide)
    // slice by TIMESTAMP: the same (user, item) pair straddles both slices
    // under %20 (u1,i1 at ts 10 and 40), the hardest case for additivity
    for (slicer <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        c => c % 20 === 0, c => c % 3 === 0)) {
      val m = new BiasModel()
      m.fitFromStats(m.mergeStats(
        m.pairStats(wide.filter(slicer($"timestamp"))),
        m.pairStats(wide.filter(!slicer($"timestamp")))))
      assert(m.muPpm == full.muPpm)
      assertSameRows(m.itemBias, full.itemBias.as[(Long, Long)].collect().toSeq)
      assertSameRows(m.userBias, full.userBias.as[(Long, Long)].collect().toSeq)
    }
  }

  test("predict: seen-filtered top-k ordered by item bias") {
    val m = new BiasModel().fit(log)
    // u1 saw both items → nothing left; u2 saw i1 → recs = i2 only
    val recs = m.predict(log, k = 5).collect()
    assert(recs.length == 1)
    assert(recs.head.getLong(0) == 2L && recs.head.getLong(1) == 2L)
    assert(recs.head.getDouble(2) == (3000000L - 15151L - 181818L).toDouble)
  }

  test("ModelIO round-trip: loaded model predicts pairs identically") {
    val m = new BiasModel().fit(log)
    val dir = java.nio.file.Files.createTempDirectory("bias_io").toString
    ModelIO.save(m, dir)
    val loaded = ModelIO.load(spark, dir).asInstanceOf[BiasModel]
    val pairs = Seq((2L, 2L), (99L, 1L)).toDF("query_id", "item_id")
    assertSameRows(loaded.predictPairs(pairs, log), Seq(
      (2L, 2L, 3000000L - 15151L - 181818L),
      (99L, 1L, 3000000L + 166666L)))
    assert(loaded.muPpm == 3000000L && loaded.lambdaItem == 10L)
  }

  test("zero damping reduces to plain residual means") {
    val m = new BiasModel(lambdaItem = 0L, lambdaUser = 0L).fit(log)
    // b_i1 = 2e6 div 2 = 1e6; b_i2 = −2e6 div 1 = −2e6
    assertSameRows(m.itemBias, Seq((1L, 1000000L), (2L, -2000000L)))
  }
}
