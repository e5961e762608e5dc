package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 4): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts),
        iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("a cycle is the exact fixpoint: every rank stays at unit") {
    // inc = unit div 1 = unit; r' = 150000 + (85*unit) div 100 = unit
    assert(ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 5)
      == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("dangling mass redistributes uniformly: a->b hand-computed, 2 rounds") {
    // n=2. round 1: dang=unit, share=500000;
    //   a: 150000 + 85*500000 div 100            = 575000
    //   b: 150000 + 85*(1000000+500000) div 100  = 1425000
    assert(ranks(Seq((1L, 2L)), iters = 1) == Map(1L -> 575000L, 2L -> 1425000L))
    // round 2: dang=1425000, share=712500;
    //   a: 150000 + 85*712500 div 100            = 755625
    //   b: 150000 + 85*(575000+712500) div 100   = 1244375
    assert(ranks(Seq((1L, 2L)), iters = 2) == Map(1L -> 755625L, 2L -> 1244375L))
  }

  test("star graph: the hub outranks every leaf") {
    val r = ranks((1L to 5L).map(l => (l, 0L)), iters = 3)
    assert((1L to 5L).forall(l => r(0L) > r(l)))
    assert((1L to 5L).map(r).distinct.size == 1) // leaves symmetric
  }

  test("total mass is conserved up to the documented floor leakage") {
    val edges = for (u <- 1L to 40L; v <- Seq((u * 7) % 40 + 1, (u * 3) % 40 + 1)
      if u != v) yield (u, v)
    val n = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    for (iters <- Seq(1, 3, 6)) {
      val total = ranks(edges, iters).values.sum
      val budget = iters.toLong * (edges.distinct.size + 3L * n)
      assert(total <= n * 1000000L, s"mass created at iters=$iters")
      assert(total >= n * 1000000L - budget,
        s"iters=$iters lost ${n * 1000000L - total} > budget $budget")
    }
  }

  test("result is independent of input partitioning (exact integer arithmetic)") {
    val edges = (1L to 30L).map(u => (u, (u * 11) % 30 + 1))
    assert(ranks(edges, 3, parts = 1) == ranks(edges, 3, parts = 13))
  }

  test("parallel edges collapse to one (unweighted formulation)") {
    assert(ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 4)
      == ranks(Seq((1L, 2L), (2L, 1L)), 4))
  }

  test("rejects an empty graph and bad parameters") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, dampingPct = 101))
    intercept[IllegalArgumentException](
      Graph.pageRank(e.filter(F.lit(false)), iterations = 1))
  }
}
