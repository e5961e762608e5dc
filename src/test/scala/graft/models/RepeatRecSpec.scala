package graft.models

import graft.SparkSpec
import java.sql.Timestamp

class RepeatRecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def log = Seq(
    (1L, 10L, ts("2024-01-01 00:00:00")),
    (1L, 10L, ts("2024-01-05 00:00:00")), // repeat: last wins
    (1L, 20L, ts("2024-01-03 00:00:00")),
    (1L, 30L, ts("2024-01-03 00:00:00")), // tie with nothing (distinct item)
    (2L, 20L, ts("2024-01-02 00:00:00")),
  ).toDF("query_id", "item_id", "timestamp")

  test("predict ranks own items most-recent first, ties by item asc") {
    val m = new RepeatRec().fit(log)
    val r = m.predict(log, k = 2, filterSeen = false)
      .orderBy("query_id", "rating")
      .select("query_id", "item_id").as[(Long, Long)].collect().toSeq
    // u1: item 10 last seen Jan 5 (repeat bumped it), then 20/30 tie on
    // Jan 3 → item 20 wins the tie; u2: item 20
    assert(r == Seq((1L, 20L), (1L, 10L), (2L, 20L)))
  }

  test("state carries exact last_ts_us and frequency") {
    val m = new RepeatRec().fit(log)
    val st = m.state.filter($"query_id" === 1L && $"item_id" === 10L)
      .select("last_ts_us", "cnt").as[(Long, Long)].head()
    assert(st._2 == 2L)
    assert(st._1 == ts("2024-01-05 00:00:00").getTime * 1000L)
  }

  test("filterSeen = true is a contract error, not an empty frame") {
    val m = new RepeatRec().fit(log)
    val e = intercept[IllegalArgumentException] { m.predict(log, k = 2) }
    assert(e.getMessage.contains("filterSeen"))
  }

  test("predictPairs scores known pairs, zero for never-consumed") {
    val m = new RepeatRec().fit(log)
    val pairs = Seq((1L, 10L), (1L, 99L)).toDF("query_id", "item_id")
    val got = m.predictPairs(pairs, log).orderBy("item_id")
      .select("rating").as[Double].collect().toSeq
    assert(got == Seq(ts("2024-01-05 00:00:00").getTime * 1000.0, 0.0))
  }

  test("save/load round-trips") {
    val m = new RepeatRec().fit(log)
    val dir = java.nio.file.Files.createTempDirectory("repeat").toString
    ModelIO.save(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[RepeatRec]
    val a = m.predict(log, 2, filterSeen = false)
      .orderBy("query_id", "item_id").collect().toSeq
    val b = back.predict(log, 2, filterSeen = false)
      .orderBy("query_id", "item_id").collect().toSeq
    assert(a == b)
  }
}
