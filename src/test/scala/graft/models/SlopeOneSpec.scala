package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class SlopeOneSpec extends SparkSpec {
  import spark.implicits._

  // the Lemire-style worked example (ratings as exact integers):
  // u1: I=5, J=3; u2: I=3, J=4, K=1; u3: J=2, K=4
  private val I = 1L; private val J = 2L; private val K = 3L
  private def log = Seq(
    (1L, I, 5.0), (1L, J, 3.0),
    (2L, I, 3.0), (2L, J, 4.0), (2L, K, 1.0),
    (3L, J, 2.0), (3L, K, 4.0),
  ).toDF("query_id", "item_id", "rating")

  test("hand golden: weighted slope-one prediction in exact ppm") {
    val m = new SlopeOne().fit(log)
    // dev(J→I) = (5−3)+(3−4) = 1, n=2; dev(K→I) = (3−1) = 2, n=1
    // r̂(u3, I) = (dev_JI + 2·r(u3,J) + dev_KI + 1·r(u3,K)) div 3
    //          = (1e6 + 4e6 + 2e6 + 4e6) div 3 = 3666666
    val pairs = Seq((3L, I)).toDF("query_id", "item_id")
    val got = m.predictPairs(pairs, log).select("pred_ppm").as[Long].head()
    assert(got == 3666666L)
  }

  test("deviation table is antisymmetric with shared support") {
    val m = new SlopeOne().fit(log)
    val d = m.deviations.as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(d((J, I)) == ((2L, 1000000L)))
    assert(d((I, J)) == ((2L, -1000000L)))
    assert(d((K, I)) == ((1L, 2000000L)))
  }

  test("duplicate ratings pre-average to the floor-ppm mean") {
    val dup = log.unionAll(Seq((1L, I, 4.0)).toDF("query_id", "item_id", "rating"))
    val m = new SlopeOne().fit(dup)
    // r(u1, I) becomes (5e6+4e6) div 2 = 4.5e6 ⇒ dev(J→I) = (4.5−3)+(3−4)
    val d = m.deviations.filter($"item_from" === J && $"item_to" === I)
      .select("dev_ppm").as[Long].head()
    assert(d == 500000L)
  }

  test("unsupported pairs come back NULL; top-k predict ranks by score") {
    val m = new SlopeOne().fit(log)
    val lone = Seq((9L, 9L, 3.0)).toDF("query_id", "item_id", "rating")
    val m2 = new SlopeOne().fit(log.unionAll(lone))
    val pairs = Seq((9L, I)).toDF("query_id", "item_id")
    assert(m2.predictPairs(pairs, log.unionAll(lone))
      .filter($"pred_ppm".isNull).count() == 1)
    val recs = m.predict(log, k = 1)
    assert(recs.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ <= 1))
    // u1 never rated K: prediction flows through J and I deviations
    assert(recs.filter($"query_id" === 1L).select("item_id").as[Long].head() == K)
  }

  test("incremental stats: user-disjoint slices rebuild the full fit exactly") {
    val full = new SlopeOne().fit(log)
    for (parity <- Seq(2L, 3L)) {
      val probe = new SlopeOne()
      val (h, r) = probe.mergeStats(
        probe.coStats(log.filter($"query_id" % parity === 0)),
        probe.coStats(log.filter($"query_id" % parity =!= 0)))
      val m = new SlopeOne().fitFromStats(h, r)
      val a = full.deviations.orderBy("item_from", "item_to").collect().toSeq
      val b = m.deviations.orderBy("item_from", "item_to").collect().toSeq
      assert(a == b)
      val pairs = log.select("query_id", "item_id")
      val x = full.predictPairs(pairs, log)
        .orderBy("query_id", "item_id").collect().toSeq
      val y = m.predictPairs(pairs, log)
        .orderBy("query_id", "item_id").collect().toSeq
      assert(x == y)
    }
  }

  test("save/load round-trips") {
    val m = new SlopeOne().fit(log)
    val dir = java.nio.file.Files.createTempDirectory("slopeone").toString
    ModelIO.save(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[SlopeOne]
    val a = m.predict(log, 2).orderBy("query_id", "item_id").collect().toSeq
    val b = back.predict(log, 2).orderBy("query_id", "item_id").collect().toSeq
    assert(a == b)
  }
}
