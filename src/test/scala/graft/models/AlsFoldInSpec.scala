package graft.models

import org.apache.spark.sql.{functions => F}
import graft.SparkSpec

class AlsFoldInSpec extends SparkSpec {
  import spark.implicits._

  // 6 users × 8 items, mixed ratings — enough structure for a stable fit
  private def log = (for {
    u <- 1L to 6L
    i <- 1L to 8L
    if (u + i) % 3 != 0
  } yield (u, i, ((u * i) % 5 + 1).toDouble)).toSeq
    .toDF("query_id", "item_id", "rating")

  private def maxFactorDiff(m: ALSRec): Double = {
    val folded = m.foldInFactors(log)
    val trained = m.userFactors.select(
      F.col("id").cast("long").as("query_id"),
      F.col("features").cast("array<double>").as("tvec"))
    folded.join(trained, Seq("query_id"))
      .select(F.aggregate(
        F.zip_with(F.col("vec"), F.col("tvec"), (a, b) => F.abs(a - b)),
        F.lit(0.0), (acc, x) => F.greatest(acc, x)).as("d"))
      .agg(F.max("d")).first().getDouble(0)
  }

  test("fold-in of a training user's history reproduces the trained factor (implicit)") {
    val m = new ALSRec(rank = 4, maxIter = 10, regParam = 0.1,
      implicitPrefs = true).fit(log)
    assert(maxFactorDiff(m) < 1e-4, s"implicit fold-in diverged: ${maxFactorDiff(m)}")
  }

  test("fold-in of a training user's history reproduces the trained factor (explicit)") {
    val m = new ALSRec(rank = 4, maxIter = 10, regParam = 0.1,
      implicitPrefs = false).fit(log)
    assert(maxFactorDiff(m) < 1e-4, s"explicit fold-in diverged: ${maxFactorDiff(m)}")
  }

  test("cold user gets finite factors and seen-filtered top-k without a refit") {
    val m = new ALSRec(rank = 4, maxIter = 10).fit(log)
    // user 99 never seen at fit: history over known items
    val cold = Seq((99L, 1L, 3.0), (99L, 2L, 5.0)).toDF("query_id", "item_id", "rating")
    val full = log.unionByName(cold)
    val recs = m.predictFoldIn(full, k = 3,
      queries = Some(Seq(Tuple1(99L)).toDF("query_id"))).collect()
    assert(recs.length == 3)
    assert(recs.forall(r => r.getLong(0) == 99L))
    assert(recs.forall(r => !java.lang.Double.isNaN(r.getDouble(2))))
    val items = recs.map(_.getLong(1)).toSet
    assert(!items.contains(1L) && !items.contains(2L), "seen items must be filtered")
  }

  test("history over only fit-unknown items drops the user (no factor to project)") {
    val m = new ALSRec(rank = 4, maxIter = 5).fit(log)
    val ghost = Seq((77L, 999L, 1.0)).toDF("query_id", "item_id", "rating")
    assert(m.foldInFactors(ghost).count() == 0)
  }
}
