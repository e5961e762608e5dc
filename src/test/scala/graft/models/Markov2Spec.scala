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

  test("merge law: user-disjoint slice stats rebuild the full two-tier fit exactly") {
    import org.apache.spark.sql.{functions => F}
    for (parity <- Seq(2L, 3L)) {
      val probe = new Markov2Rec()
      val (t2, t1) = probe.mergeStats(
        probe.transStats(log.filter(F.col("query_id") % parity === 0)),
        probe.transStats(log.filter(F.col("query_id") % parity =!= 0)))
      val merged = new Markov2Rec().fitFromStats(t2, t1)
      val full = new Markov2Rec().fit(log)
      assertSameRows(merged.transitions2, full.transitions2.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      assertSameRows(merged.backoff.transitions,
        full.backoff.transitions.collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      assertSameRows(merged.predict(log, k = 5),
        full.predict(log, k = 5).collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    }
    // minCount applies on MERGED counts: a pair split across slices with
    // per-slice count 1 must survive a minCount=2 rebuild
    val floor = new Markov2Rec(minCount = 2L)
    val (t2f, t1f) = floor.mergeStats(
      floor.transStats(log.filter(F.col("query_id") === 1L)),
      floor.transStats(log.filter(F.col("query_id") =!= 1L)))
    val m2 = new Markov2Rec(minCount = 2L).fitFromStats(t2f, t1f)
    val f2 = new Markov2Rec(minCount = 2L).fit(log)
    assertSameRows(m2.backoff.transitions,
      f2.backoff.transitions.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }
}
