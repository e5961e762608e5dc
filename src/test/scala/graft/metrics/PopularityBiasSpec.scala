package graft.metrics

import graft.SparkSpec

class PopularityBiasSpec extends SparkSpec {
  import spark.implicits._

  // pops: item1=4 users, item2=3, item3=2, item4=1, item5=1 → nItems=5,
  // head = top 200‰ = 1 item = {item1}
  private def train = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
    (1L, 2L), (2L, 2L), (3L, 2L),
    (1L, 3L), (2L, 3L),
    (1L, 4L), (2L, 5L),
  ).toDF("query_id", "item_id")

  test("hand golden: ARP and APLT in exact ppm, cold rec items count as tail") {
    val recs = Seq((1L, 1L), (1L, 3L), (2L, 2L), (2L, 99L))
      .toDF("query_id", "item_id")
    // u1 [1,3]: arp = (4+2)e6 div 2 = 3000000; aplt = 1e6 div 2 (item3 tail)
    // u2 [2,99]: arp = (3+0)e6 div 2 = 1500000; aplt = 2e6 div 2 (both tail)
    val out = Metrics.popularityBias(recs, train)
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((2L, 1L, 2250000L, 750000L)))
  }

  test("an all-head rec set scores APLT 0; an all-tail one scores 1e6") {
    val allHead = Seq((7L, 1L)).toDF("query_id", "item_id")
    assert(Metrics.popularityBias(allHead, train)
      .select("aplt_ppm").as[Long].head() == 0L)
    val allTail = Seq((7L, 4L), (7L, 5L)).toDF("query_id", "item_id")
    assert(Metrics.popularityBias(allTail, train)
      .select("aplt_ppm").as[Long].head() == 1000000L)
  }

  test("head boundary ties break by item id ascending") {
    // items 10 and 20 tie on popularity; headPermille=500 keeps exactly
    // one of two items — the SMALLER id
    val t = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L))
      .toDF("query_id", "item_id")
    val recs = Seq((5L, 10L), (5L, 20L)).toDF("query_id", "item_id")
    val out = Metrics.popularityBias(recs, t, headPermille = 500)
      .as[(Long, Long, Long, Long)].head()
    // head = {10}: aplt = 1e6 div 2 = 500000
    assert(out == ((1L, 1L, 2000000L, 500000L)))
  }
}
