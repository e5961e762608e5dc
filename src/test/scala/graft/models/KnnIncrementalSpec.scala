package graft.models

import graft.SparkSpec

class KnnIncrementalSpec extends SparkSpec {
  import spark.implicits._

  // 8 users, deterministic overlapping baskets
  private def log = (for {
    u <- 1L to 8L
    i <- 1L to 10L
    if (u * 3 + i * 7) % 4 != 0
  } yield (u, i, 1.0)).toSeq.toDF("query_id", "item_id", "rating")

  private def simSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("user-disjoint co-stats merge followed by fitFromStats equals a full refit, exactly") {
    val full = new ItemKNN(numNeighbours = 5).fit(log).similarity
    val a = log.filter($"query_id" <= 4)
    val b = log.filter($"query_id" > 4)
    val probe = new ItemKNN(numNeighbours = 5)
    val (pairs, dfs) = ItemKNN.mergeStats(probe.coStats(a), probe.coStats(b))
    val inc = new ItemKNN(numNeighbours = 5).fitFromStats(pairs, dfs)
    assert(simSet(inc.similarity) == simSet(full),
      "merged-stats similarity must be bit-identical to the full fit")
  }

  test("three-way merge is associative in effect: any slicing gives the full fit") {
    val full = new ItemKNN(numNeighbours = 3).fit(log).similarity
    val probe = new ItemKNN(numNeighbours = 3)
    val s1 = probe.coStats(log.filter($"query_id" <= 2))
    val s2 = probe.coStats(log.filter($"query_id" > 2 && $"query_id" <= 6))
    val s3 = probe.coStats(log.filter($"query_id" > 6))
    val (p, d) = ItemKNN.mergeStats(ItemKNN.mergeStats(s1, s2), s3)
    val inc = new ItemKNN(numNeighbours = 3).fitFromStats(p, d)
    assert(simSet(inc.similarity) == simSet(full))
  }

  test("stats-refit model predicts identically to the fit model") {
    val fitted = new ItemKNN(numNeighbours = 5).fit(log)
    val probe = new ItemKNN(numNeighbours = 5)
    val (p, d) = probe.coStats(log)
    val inc = new ItemKNN(numNeighbours = 5).fitFromStats(p, d)
    assert(simSet(fitted.predict(log, 3)) == simSet(inc.predict(log, 3)))
  }

  test("weighted fits refuse the sufficient-stats path") {
    intercept[IllegalArgumentException](
      new ItemKNN(weighting = Some("bm25")).coStats(log))
    intercept[IllegalArgumentException](
      new ItemKNN(weighting = Some("tf_idf"))
        .fitFromStats(log.limit(0), log.limit(0)))
  }
}
