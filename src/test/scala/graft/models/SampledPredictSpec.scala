package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** SampledPredict — the personalized sampling surface (base_rec.py:
  * 1259-1364 generalized): E–S draw per query over a per-(query, item)
  * score table, zero/negative floor, normalized probability. */
class SampledPredictSpec extends SparkSpec {
  import spark.implicits._

  private def scores = Seq(
    (1L, 10L, 4.0), (1L, 20L, 2.0), (1L, 30L, 6.0), (1L, 40L, 0.5),
    (2L, 10L, 1.0), (2L, 20L, 1.0),
    (3L, 10L, 3.0)).toDF("query_id", "item_id", "rating")

  test("draw is k-per-query, rank-contiguous, probability-normalized") {
    val out = SampledPredict.sampleScores(scores, k = 2, seed = 7L)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ(1L).length == 2 && byQ(2L).length == 2 && byQ(3L).length == 1)
    for ((_, rs) <- byQ)
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    // probs are w/Σw over the FULL pool, not the survivors: query 1's
    // probabilities must reflect all four weights (Σ=12.5)
    val p1 = rows.filter(r => r.getLong(0) == 1L)
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    for ((i, p) <- p1) {
      val w = Map(10L -> 4.0, 20L -> 2.0, 30L -> 6.0, 40L -> 0.5)(i)
      assert(math.abs(p - w / 12.5) < 1e-12, s"item $i prob $p")
    }
  }

  test("draw is bit-identical across partition layouts and repeated runs") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SampledPredict.sampleScores(df, k = 2, seed = 7L)
        .select("query_id", "item_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(scores) == run(scores.repartition(7)))
    assert(run(scores) == run(scores.orderBy(F.col("item_id").desc)))
  }

  test("zero/negative scores are floored to 1e-6, not crashed or excluded") {
    val mixed = Seq(
      (1L, 10L, 5.0), (1L, 20L, -3.0), (1L, 30L, 0.0))
      .toDF("query_id", "item_id", "rating")
    val out = SampledPredict.sampleScores(mixed, k = 3, seed = 7L).collect()
    assert(out.length == 3) // floored items stay drawable
    val probs = out.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // floored weights are 1e-6 each: Σw = 5.0 + 2e-6
    assert(math.abs(probs(10L) - 5.0 / (5.0 + 2e-6)) < 1e-12)
    assert(probs(20L) > 0 && probs(30L) > 0)
  }

  test("probaFromScores tiles the full-pool distribution over k positions") {
    val out = SampledPredict.probaFromScores(scores.filter($"query_id" === 1L), k = 3)
    val rows = out.collect()
    assert(rows.length == 4 * 3)
    assert(rows.map(_.getLong(2)).toSet == Set(0L, 1L, 2L))
    // per-(query, position) mass sums to exactly 1
    val mass = rows.filter(_.getLong(2) == 1L).map(_.getDouble(3)).sum
    assert(math.abs(mass - 1.0) < 1e-12)
  }
}
