package graft.text

import graft.SparkSpec
import graft.models.HnswIndexTestAccess

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // unstructured seeded corpus: pairwise cosines stay far below dedup taus
  // (32 dims: cosine std ≈ 1/√32 ≈ 0.18 — a natural 0.95 is a >5σ event)
  private def distinct(n: Int, dims: Int = 32): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { id =>
      (id, (0 until dims).map(d =>
        HnswIndexTestAccess.uniform(11L, id * 101 + d) - 0.5))
    }

  test("planted exact copies are dropped; lowest id survives; distinct docs all kept") {
    val base = distinct(80)
    val copies = (0 until 10).map(i => (1000L + i, base(i * 7)._2)) // cos = 1
    val all = base ++ copies
    val v = SemDedup.verdicts(all.toDF("vec_id", "embedding"),
      nClusters = 6, tau = 0.95)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    copies.foreach { case (cid, _) =>
      assert(!v(cid), s"planted copy $cid must be dropped")
    }
    base.foreach { case (bid, _) =>
      assert(v(bid), s"distinct doc $bid must be kept")
    }
  }

  test("keep rule: the farthest-from-centroid member of a duplicate group survives") {
    // one cluster (nClusters=1); two colinear duplicate groups at
    // different norms — cosine within a group is 1.0, across groups 0.0
    val rows = Seq(
      (0L, Seq(10.0, 0.0)), (1L, Seq(2.0, 0.0)),  // group A
      (2L, Seq(0.0, 8.0)), (3L, Seq(0.0, 3.0)),   // group B
    )
    val v = SemDedup.verdicts(rows.toDF("vec_id", "embedding"),
      nClusters = 1, tau = 0.99)
      .select("vec_id", "crank", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    // centroid = (3, 2.75): distances put 10e1 and 8e2 farthest — the
    // paper's keep-hard-examples rule retains them, drops the near twins
    assert(v(0L)._2 && v(2L)._2, s"farthest members must be kept: $v")
    assert(!v(1L)._2 && !v(3L)._2, s"closer twins must be dropped: $v")
    // and every dropped doc has an earlier-ranked (farther) kept witness
    assert(v(0L)._1 < v(1L)._1 && v(2L)._1 < v(3L)._1)
  }

  test("verdicts are deterministic across input partition layouts") {
    val base = distinct(60) ++ (0 until 6).map(i => (500L + i, distinct(60)(i * 9)._2))
    def run(parts: Int): Set[(Long, Boolean)] =
      SemDedup.verdicts(base.toDF("vec_id", "embedding").repartition(parts),
        nClusters = 4, tau = 0.95)
        .select("vec_id", "keep").as[(Long, Boolean)].collect().toSet
    assert(run(1) == run(7))
  }

  test("dedup returns exactly the kept input rows") {
    val base = distinct(40)
    val all = base ++ Seq((900L, base(3)._2), (901L, base(5)._2))
    val kept = SemDedup.dedup(all.toDF("vec_id", "embedding"),
      nClusters = 3, tau = 0.95)
    assert(kept.count() == 40)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
    val ids = kept.select("vec_id").as[Long].collect().toSet
    assert(ids == base.map(_._1).toSet)
  }

  test("clusterStats audits occupancy: sizes sum to n, pair algebra holds") {
    val rows = distinct(50)
    val stats = SemDedup.clusterStats(rows.toDF("vec_id", "embedding"),
      nClusters = 4).collect()
    assert(stats.map(_.getLong(1)).sum == 50)
    stats.foreach { r =>
      val (s, p) = (r.getLong(1), r.getLong(2))
      assert(p == s * (s - 1) / 2)
    }
  }
}
