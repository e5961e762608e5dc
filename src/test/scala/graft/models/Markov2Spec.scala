package graft.models

import graft.SparkSpec

class Markov2Spec extends SparkSpec {
  import spark.implicits._

  // u1: 1→2→3, u2: 1→2→4, u3: 3→2, u4: 1→2
  private def log = Seq(
    (1L, 1L, 1.0, 10L), (1L, 2L, 1.0, 20L), (1L, 3L, 1.0, 30L),
    (2L, 1L, 1.0, 10L), (2L, 2L, 1.0, 20L), (2L, 4L, 1.0, 30L),
    (3L, 3L, 1.0, 10L), (3L, 2L, 1.0, 20L),
    (4L, 1L, 1.0, 10L), (4L, 2L, 1.0, 20L),
  ).toDF("query_id", "item_id", "rating", "timestamp")

  test("order-2 transitions count (prev2, prev1) -> next") {
    val m = new Markov2Rec().fit(log)
    assertSameRows(m.transitions2,
      Seq((1L, 2L, 3L, 1L), (1L, 2L, 4L, 1L)))
  }

  test("predict routes observed contexts to order-2 and the rest to backoff") {
    val m = new Markov2Rec().fit(log)
    // u4 context (1,2) observed → order-2 candidates {3,4}; u3 context
    // (3,2) unobserved → order-1 from item 2 → {3 seen, 4}; u1 context
    // (2,3) unobserved → order-1 from 3 → {2 seen}; u2 from 4 → nothing
    assertSameRows(m.predict(log, k = 5),
      Seq((3L, 4L, 1.0), (4L, 3L, 1.0), (4L, 4L, 1.0)))
    assertSameRows(m.predict(log, k = 5, filterSeen = false),
      Seq((1L, 2L, 1.0), (3L, 3L, 1.0), (3L, 4L, 1.0),
          (4L, 3L, 1.0), (4L, 4L, 1.0)))
  }

  test("predictPairs scores order-2 contexts from t2 and others from backoff") {
    val m = new Markov2Rec().fit(log)
    val pairs = Seq((4L, 3L), (4L, 9L), (3L, 3L)).toDF("query_id", "item_id")
    assertSameRows(m.predictPairs(pairs, log),
      Seq((4L, 3L, 1.0), (4L, 9L, 0.0), (3L, 3L, 1.0)))
  }

  test("ModelIO round-trip preserves both tiers") {
    val m = new Markov2Rec().fit(log)
    val dir = java.nio.file.Files.createTempDirectory("markov2_io").toString
    ModelIO.save(m, dir)
    val loaded = ModelIO.load(spark, dir).asInstanceOf[Markov2Rec]
    assertSameRows(loaded.predict(log, k = 5),
      Seq((3L, 4L, 1.0), (4L, 3L, 1.0), (4L, 4L, 1.0)))
  }
}
