package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class P3AlphaSpec extends SparkSpec {
  import spark.implicits._

  // u1 rated {a,b}, u2 rated {a,b,c}: deg(a)=2 deg(b)=2 deg(c)=1,
  // du(u1)=2, du(u2)=3 — small enough to walk by hand
  private val a = 1L; private val b = 2L; private val c = 3L
  private def log = Seq(
    (1L, a, 1.0), (1L, b, 1.0),
    (2L, a, 1.0), (2L, b, 1.0), (2L, c, 1.0),
  ).toDF("query_id", "item_id", "rating")

  private def sims(m: P3AlphaRec): Map[(Long, Long), Long] =
    m.similarity.as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

  test("hand golden: the 2-step walk matrix in exact ppt") {
    val m = new P3AlphaRec(topKNeighbours = 0).fit(log)
    val s = sims(m)
    // sim(a→b) = 1e12 div (2·2) + 1e12 div (2·3) = 250e9 + 166666666666
    assert(s((a, b)) == 416666666666L)
    assert(s((b, a)) == 416666666666L)
    // sim(a→c): only u2 co-rates: 1e12 div (2·3)
    assert(s((a, c)) == 166666666666L)
    // sim(c→a): 1e12 div (1·3) — the source degree flips
    assert(s((c, a)) == 333333333333L)
    assert(s((b, c)) == 166666666666L)
    assert(s((c, b)) == 333333333333L)
    assert(s.size == 6) // no diagonal by construction
  }

  test("β=1 divides by the TARGET degree; β=2 divides twice") {
    val s1 = sims(new P3AlphaRec(beta = 1, topKNeighbours = 0).fit(log))
    assert(s1((a, b)) == 416666666666L / 2)
    assert(s1((a, c)) == 166666666666L)      // deg(c)=1
    assert(s1((c, a)) == 333333333333L / 2)
    val s2 = sims(new P3AlphaRec(beta = 2, topKNeighbours = 0).fit(log))
    assert(s2((a, b)) == 416666666666L / 2 / 2)
  }

  test("neighbour crop keeps the top-k per SOURCE with item-asc ties") {
    val m = new P3AlphaRec(topKNeighbours = 1).fit(log)
    val s = sims(m)
    assert(s.keys.map(_._1).toSeq.sorted == Seq(a, b, c))
    assert(s((a, b)) == 416666666666L) // b beats c from a
    assert(s((b, a)) == 416666666666L)
    // from c both targets tie at 333333333333 → item asc keeps a
    assert(s((c, a)) == 333333333333L)
  }

  test("predict walks the third step and filters seen") {
    val m = new P3AlphaRec(topKNeighbours = 0).fit(log)
    val recs = m.predict(log, k = 5)
    // u1 has seen {a,b}; only c remains:
    // score(u1,c) = (sim(a→c)+sim(b→c)) div du(u1) = 333333333332 div 2
    val r = recs.filter($"query_id" === 1L)
      .select("item_id", "rating").as[(Long, Double)].collect()
    assert(r.toSeq == Seq((c, 166666666666L / 1e12)))
    // u2 has seen everything → nothing to recommend
    assert(recs.filter($"query_id" === 2L).count() == 0)
  }

  test("predictPairs scores requested pairs only; singletons come back NULL") {
    val lone = Seq((9L, 9L, 1.0)).toDF("query_id", "item_id", "rating")
    val m = new P3AlphaRec(topKNeighbours = 0).fit(log.unionAll(lone))
    val pairs = Seq((1L, c), (9L, a)).toDF("query_id", "item_id")
    val got = m.predictPairs(pairs, log).orderBy("query_id").collect()
    assert(got(0).getLong(2) == 166666666666L)
    assert(got(1).isNullAt(2)) // item 9 shares no co-rater with a
  }

  test("search space draws stay inside the declared bounds") {
    val m = new P3AlphaRec()
    for (d <- graft.metrics.RandomSearch.draws(m.searchBorders, 20, 42)) {
      val c = m.withParams(d)
      assert(c.beta >= 0 && c.beta <= 3)
      assert(c.topKNeighbours >= 10 && c.topKNeighbours <= 500)
      assert(c.maxUserHistory == m.maxUserHistory)
    }
  }

  test("save/load round-trips") {
    val m = new P3AlphaRec(beta = 1, topKNeighbours = 2).fit(log)
    val dir = java.nio.file.Files.createTempDirectory("p3alpha").toString
    ModelIO.save(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[P3AlphaRec]
    assert(back.beta == 1 && back.topKNeighbours == 2)
    val x = m.predict(log, 2).orderBy("query_id", "item_id").collect().toSeq
    val y = back.predict(log, 2).orderBy("query_id", "item_id").collect().toSeq
    assert(x == y)
  }
}
