package graft.metrics

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class TopKListSpec extends SparkSpec {
  import spark.implicits._

  test("bounded enrichment equals the sort-based enrichment") {
    val rnd = new scala.util.Random(3)
    val recs = List.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(100).toDouble)).distinct
      .toDF("query_id", "item_id", "rating")
      .groupBy("query_id", "item_id").agg(F.max("rating").as("rating"))
    val gt = List.fill(40)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong))
      .toDF("query_id", "item_id")
    val full = Metrics.enrich(recs, gt)
      .select($"query_id", F.slice($"pred", 1, 5).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bounded = TopKList.enrichBounded(recs, gt, maxK = 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(full.keySet == bounded.keySet)
    full.foreach { case (q, lst) => assert(bounded(q) == lst, s"user $q") }
  }

  test("aggregator state never exceeds k") {
    val agg = new TopKList.TopKAggregator(3)
    var buf = agg.zero
    (1 to 100).foreach(i => buf = agg.reduce(buf, (i.toDouble, i.toLong)))
    assert(buf.items.length == 3)
    assert(agg.finish(buf) == Seq(100L, 99L, 98L))
    // merge keeps order + bound
    var other = agg.zero
    (200 to 210).foreach(i => other = agg.reduce(other, (i.toDouble, i.toLong)))
    val merged = agg.merge(buf, other)
    assert(agg.finish(merged) == Seq(210L, 209L, 208L))
  }
}
