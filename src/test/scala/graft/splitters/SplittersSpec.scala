package graft.splitters

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}
import java.sql.Timestamp

class SplittersSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  def log: DataFrame = Seq(
    (0L, 0L, ts("2024-01-01 10:00:00")), (0L, 1L, ts("2024-01-02 10:00:00")),
    (0L, 2L, ts("2024-01-03 10:00:00")), (0L, 3L, ts("2024-01-04 10:00:00")),
    (0L, 4L, ts("2024-01-05 10:00:00")),
    (1L, 0L, ts("2024-01-02 10:00:00")), (1L, 1L, ts("2024-01-06 10:00:00")),
    (2L, 2L, ts("2024-01-07 10:00:00")),
  ).toDF("query_id", "item_id", "timestamp")

  /** Shared invariant: marked = input, train ∪ test = input, disjoint. */
  def checkPartition(sp: Splitter): Unit = {
    val (train, test) = sp.split(log)
    assert(train.count() + test.count() == log.count())
    assert(train.intersect(test).count() == 0)
  }

  test("RatioSplitter marks per-user tail by time") {
    val marked = RatioSplitter(0.4).mark(log)
    // user 0: 5 events, test = last 2 (rn > 5*0.6=3)
    val u0 = marked.filter($"query_id" === 0 && $"is_test").select("item_id")
      .as[Long].collect().toSet
    assert(u0 == Set(3L, 4L))
    checkPartition(RatioSplitter(0.4))
  }

  test("LastNSplitter takes last n per user") {
    val marked = LastNSplitter(1).mark(log)
    val testItems = marked.filter($"is_test").select("query_id", "item_id")
      .as[(Long, Long)].collect().toSet
    assert(testItems == Set((0L, 4L), (1L, 1L), (2L, 2L)))
  }

  test("TimeSplitter splits on a literal threshold") {
    val (train, test) = TimeSplitter("2024-01-05").split(log)
    assert(train.count() == 5 && test.count() == 3)
  }

  test("TimeSplitter.byQuantile cuts at the rank-based quantile") {
    val marked = TimeSplitter.byQuantile(log, 0.5)
    assert(marked.filter($"is_test").count() == 4) // 4 of 8 above median ts
  }

  test("NewUsersSplitter sends whole users with recent first events to test") {
    val marked = NewUsersSplitter(0.34, queryCol = "query_id").mark(log)
    // 3 users, ceil-ish 1 newest first-event user = user 2 (2024-01-07)
    val testUsers = marked.filter($"is_test").select("query_id").distinct()
      .as[Long].collect().toSet
    assert(testUsers == Set(2L))
    // all of user 2's events are test
    assert(marked.filter($"query_id" === 2 && !$"is_test").count() == 0)
  }

  test("ColdUserSplitter picks whole users deterministically") {
    val m1 = ColdUserSplitter(0.34, seed = 42, queryCol = "query_id").mark(log)
    val m2 = ColdUserSplitter(0.34, seed = 42, queryCol = "query_id").mark(log)
    assert(m1.collect().toSet == m2.collect().toSet) // deterministic
    val perUser = m1.groupBy("query_id").agg(F.count_distinct($"is_test").as("k"))
      .select("k").as[Long].collect()
    assert(perUser.forall(_ == 1)) // user never straddles the split
  }

  test("KFolds covers all rows exactly once across folds") {
    val kf = KFolds(3, seed = 42, queryCol = "query_id")
    val folds = kf.folds(log, Seq("item_id"))
    val testTotal = folds.map(_._2.count()).sum
    assert(testTotal == log.count())
    folds.foreach { case (tr, te) => assert(tr.count() + te.count() == log.count()) }
  }

  test("RandomNextNSplitter takes n events after a deterministic cut") {
    val marked = RandomNextNSplitter(1, seed = 42, queryCol = "query_id").mark(log)
    val perUserTest = marked.filter($"is_test").groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perUserTest.forall(_ <= 1))
    checkPartition(RandomNextNSplitter(1, seed = 42, queryCol = "query_id"))
  }

  test("dropColdItems removes test items unseen in train") {
    val sp = LastNSplitter(1, dropColdItems = true)
    val (train, test) = sp.split(log)
    val trainItems = train.select("item_id").as[Long].collect().toSet
    val testItems = test.select("item_id").as[Long].collect().toSet
    assert(testItems.subsetOf(trainItems))
  }

  test("session repair aligns flags within a session") {
    val df = Seq(
      (0L, 10L, ts("2024-01-01 10:00:00"), false),
      (0L, 10L, ts("2024-01-01 10:05:00"), true),
    ).toDF("query_id", "session_id", "timestamp", "is_test")
    val repaired = Splitter.repairSessions(df, "query_id", "session_id", "timestamp")
    assert(repaired.select("is_test").as[Boolean].collect().forall(_ == true))
  }

  test("walkForward: time-monotone buckets, leak-free expanding folds, ties share a bucket") {
    val rows = (0 until 100).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + (i / 2) * 60000L)))
    val df = rows.toDF("event_id", "timestamp").repartition(5)
    val marked = TimeSplitter.walkForwardBuckets(df, k = 4, tsCol = "timestamp")
    val got = marked.select("event_id", "bucket").as[(Long, Long)]
      .collect().toMap
    // buckets are 0..3 and roughly balanced
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L), sizes.toString)
    assert(sizes.values.forall(s => s >= 20 && s <= 30), sizes.toString)
    // rows sharing a timestamp share a bucket (event ids 2i and 2i+1 tie)
    (0 until 50).foreach(i =>
      assert(got(2L * i) == got(2L * i + 1), s"tie split at ts group $i"))
    // bucket is monotone in time
    val byTime = rows.sortBy(_._1).map(r => got(r._1))
    assert(byTime == byTime.sorted, "bucket not monotone in ts")
    // folds: every test row is strictly after every train row
    val folds = TimeSplitter.walkForward(df, k = 4, tsCol = "timestamp")
    assert(folds.size == 3)
    for ((train, test) <- folds) {
      val maxTrain = train.agg(F.max("timestamp")).first().getTimestamp(0)
      val minTest = test.agg(F.min("timestamp")).first().getTimestamp(0)
      assert(maxTrain.before(minTest), s"leak: $maxTrain !< $minTest")
    }
    // expanding: train sizes strictly grow
    val trainSizes = folds.map(_._1.count())
    assert(trainSizes == trainSizes.sorted && trainSizes.distinct == trainSizes)
    // generated-column collision is a contract error, not a silent bind
    intercept[IllegalArgumentException] {
      TimeSplitter.walkForwardBuckets(
        df.withColumn("bucket", F.lit(1)), k = 4, tsCol = "timestamp")
    }
  }
}
