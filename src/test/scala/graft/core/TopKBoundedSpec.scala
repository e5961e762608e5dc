package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** getTopKRecsBounded must return exactly the rows of the window-based
  * getTopKRecs (same multiset; order is not part of the contract). */
class TopKBoundedSpec extends SparkSpec {
  import spark.implicits._

  test("bounded crop equals window crop on random scores") {
    val rnd = new scala.util.Random(13)
    val rows = for (q <- 0L until 50L; i <- 0L until 200L)
      yield (q, i, math.floor(rnd.nextDouble() * 100) / 10.0) // ties likely
    val df = rows.toDF("query_id", "item_id", "rating")
    for (k <- Seq(1, 7, 250)) {
      val win = Ops.getTopKRecs(df, k).as[(Long, Long, Double)].collect().sorted
      val agg = Ops.getTopKRecsBounded(df, k).as[(Long, Long, Double)].collect().sorted
      assert(agg.length == win.length, s"k=$k row count")
      // values must match pairwise except where equal-rating ties allow
      // either item choice — compare (query, rating) multisets exactly
      // and (query, item, rating) sets where ratings are unique
      assert(win.map(t => (t._1, t._3)).toSeq == agg.map(t => (t._1, t._3)).toSeq, s"k=$k rating multiset")
    }
  }

  test("bounded crop exact-row equality when ratings are unique") {
    val rnd = new scala.util.Random(29)
    val rows = for (q <- 0L until 20L; i <- 0L until 100L)
      yield (q, i, rnd.nextDouble())
    val df = rows.toDF("query_id", "item_id", "rating")
    val win = Ops.getTopKRecs(df, 9).as[(Long, Long, Double)].collect().sorted.toSeq
    val agg = Ops.getTopKRecsBounded(df, 9).as[(Long, Long, Double)].collect().sorted.toSeq
    assert(win == agg)
  }

  test("deterministic tie-break: equal ratings keep lowest item ids") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 3L, 5.0), (1L, 7L, 5.0), (1L, 1L, 2.0),
    ).toDF("query_id", "item_id", "rating")
    val got = Ops.getTopKRecsBounded(df, 2).as[(Long, Long, Double)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, 3L, 5.0), (1L, 7L, 5.0)))
  }

  test("no-NaN contract: heap drops NaN where the window ranks it first") {
    // Pins the DOCUMENTED divergence behind getTopKRecsBounded's no-NaN
    // input contract (scoring paths must clamp first — LinUCB clamps its
    // quadratic form): a NaN arriving at a FULL heap is never-better and
    // silently dropped, while the rank window puts NaN above every double
    // under `desc`. (A NaN arriving while the heap still fills can even
    // slip in and corrupt the order — arrival-order-dependent — which is
    // why the contract bans NaN outright rather than defining semantics.)
    val df = Seq(
      (1L, 1L, 5.0), (1L, 2L, Double.NaN),
    ).toDF("query_id", "item_id", "rating")
    val win = Ops.getTopKRecs(df, 1).as[(Long, Long, Double)]
      .collect().map(_._2).toSet
    val agg = Ops.getTopKRecsBounded(df, 1).as[(Long, Long, Double)]
      .collect().map(_._2).toSet
    assert(win == Set(2L), "Spark desc ordering ranks NaN above all doubles")
    assert(agg == Set(1L), "a full heap never admits NaN")
  }
}
