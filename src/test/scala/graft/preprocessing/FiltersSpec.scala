package graft.preprocessing

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import java.sql.Timestamp

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // golden fixture in the reference's doctest style (filters.py:62-88)
  def log = Seq(
    (0L, 0L, 1.0, ts("2024-01-01 10:00:00")),
    (0L, 0L, 2.0, ts("2024-01-01 11:00:00")), // consecutive dup of item 0
    (0L, 1L, 3.0, ts("2024-01-02 10:00:00")),
    (0L, 0L, 4.0, ts("2024-01-05 10:00:00")),
    (1L, 1L, 5.0, ts("2024-01-03 10:00:00")),
    (1L, 2L, 1.0, ts("2024-01-09 10:00:00")),
    (2L, 2L, 2.0, ts("2024-01-10 10:00:00")),
  ).toDF("query_id", "item_id", "rating", "timestamp")

  test("LowRatingFilter keeps rating >= v") {
    assert(LowRatingFilter(3.0).transform(log).count() == 3)
  }

  test("TimePeriodFilter is [start, end)") {
    val out = TimePeriodFilter(Some("2024-01-02"), Some("2024-01-09 10:00:00"))
      .transform(log)
    assert(out.count() == 3) // 01-02, 01-05, 01-03; excludes 01-09 10:00 exactly
  }

  test("GlobalDaysFilter first N days from global min") {
    val out = GlobalDaysFilter(2).transform(log) // [01-01 10:00, 01-03 10:00)
    assert(out.count() == 3)
  }

  test("EntityDaysFilter first N days per entity") {
    val out = EntityDaysFilter(2, entityCol = "query_id").transform(log)
    // user0: window [01-01 10:00, 01-03) → 3 rows; user1: [01-03, 01-05) → 1; user2: 1
    assert(out.count() == 5)
  }

  test("NumInteractionsFilter first k per query") {
    val out = NumInteractionsFilter(2, queryCol = "query_id").transform(log)
    assert(out.count() == 5) // 2 + 2 + 1
    val u0 = out.filter($"query_id" === 0L).select("rating").as[Double].collect().toSet
    assert(u0 == Set(1.0, 2.0))
  }

  test("MinCountFilter keeps entities with >= n rows") {
    val out = MinCountFilter(2, "query_id").transform(log)
    assert(out.select("query_id").distinct().as[Long].collect().toSet == Set(0L, 1L))
  }

  test("ConsecutiveDuplicatesFilter drops repeat items per user") {
    val out = ConsecutiveDuplicatesFilter().transform(log)
    assert(out.count() == 6) // drops the second (0,0) run element
    assert(out.filter($"query_id" === 0L && $"item_id" === 0L).count() == 2)
  }

  test("InteractionEntriesFilter reaches fixpoint") {
    val out = InteractionEntriesFilter(
      minInterPerUser = Some(2), minInterPerItem = Some(2)).transform(log)
    // iteratively: user2 has 1 row → dropped; then item counts recomputed...
    val rows = out.select("query_id", "item_id").as[(Long, Long)].collect().toSet
    // every surviving user has >=2 rows and every surviving item >=2 rows
    val byUser = rows.groupBy(_._1).map(_._2.size)
    assert(out.count() > 0)
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ >= 2))
    val icounts = out.groupBy("item_id").count().as[(Long, Long)].collect().toMap
    assert(icounts.values.forall(_ >= 2))
  }

  test("QuantileItemsFilter keeps all rows when nothing exceeds quantile") {
    val out = QuantileItemsFilter(alphaQuantile = 0.99).transform(log)
    assert(out.count() == log.count())
  }
}
