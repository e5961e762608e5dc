package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ExplainSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    (1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L), (3L, 20L), (3L, 30L),
    (4L, 10L), (4L, 20L), (4L, 30L),
  ).map { case (q, i) => (q, i, 1.0) }.toDF("query_id", "item_id", "rating")

  test("contributions decompose the predicted rating exactly") {
    val m = new ItemKNN(numNeighbours = 5).fit(log)
    val recs = m.predict(log, k = 3)
    // topN = catalog size ⇒ the breakdown is complete: per (query, item),
    // sum(contribution) must equal the predicted rating (both round-9)
    val total = m.explain(log, recs, topN = 100)
      .groupBy("query_id", "item_id")
      .agg(F.round(F.sum("contribution"), 6).as("s"))
    val joined = recs
      .select($"query_id", $"item_id", F.round($"rating", 6).as("r"))
      .join(total, Seq("query_id", "item_id"), "left")
    assert(joined.filter($"s".isNull || F.abs($"s" - $"r") > 1e-6).count() == 0)
    assert(recs.count() > 0)
  }

  test("topN crops per recommendation with deterministic tie order") {
    val m = new ItemKNN(numNeighbours = 5).fit(log)
    val recs = m.predict(log, k = 3)
    val ex = m.explain(log, recs, topN = 1)
    // exactly one source per recommendation, rank 1
    assert(ex.groupBy("query_id", "item_id").count()
      .filter($"count" =!= 1L).count() == 0)
    assert(ex.filter($"contrib_rank" =!= 1L).count() == 0)
    // multiplicity: a duplicated history row doubles its contribution
    val dup = log.unionAll(log.filter($"query_id" === 1L && $"item_id" === 10L))
    val exDup = m.explain(dup, recs, topN = 100)
      .filter($"query_id" === 1L && $"source_item" === 10L)
      .select("contribution").as[Double].collect()
    val exOne = m.explain(log, recs, topN = 100)
      .filter($"query_id" === 1L && $"source_item" === 10L)
      .select("contribution").as[Double].collect()
    assert(exDup.sorted.zip(exOne.sorted).forall { case (d, o) =>
      math.abs(d - 2 * o) < 1e-8 })
  }
}
