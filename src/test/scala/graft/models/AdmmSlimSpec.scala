package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class AdmmSlimSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint item clusters {0,1,2} / {10,11,12} with disjoint users
  private def blockLog = Seq(
    (0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L),
    (3L, 2L), (3L, 0L),
    (10L, 10L), (10L, 11L), (11L, 11L), (11L, 12L), (12L, 10L), (12L, 12L),
    (13L, 10L), (13L, 11L), (13L, 12L),
  ).map { case (q, i) => (q, i, 1.0) }.toDF("query_id", "item_id", "rating")

  test("fit is deterministic, zero-diagonal, finite, and non-empty") {
    def sims() = new AdmmSlim(lambda1 = 0.05, lambda2 = 1.0).fit(blockLog)
      .similarity.orderBy("item_one", "item_two")
      .as[(Long, Long, Double)].collect().toSeq
    val a = sims()
    assert(a.nonEmpty)
    assert(a.forall { case (i, j, v) => i != j || v == 0.0 }, "diagonal must be 0")
    assert(!a.exists { case (i, j, _) => i == j }, "zero cells are not emitted")
    assert(a.forall(t => !t._3.isNaN && !t._3.isInfinite))
    assert(a == sims()) // bit-identical refit (zero init, exact Gram)
  }

  test("block-structured log learns zero cross-cluster similarity") {
    // G is block-diagonal (disjoint users) ⇒ P, B, C stay block-diagonal:
    // no similarity cell may cross the cluster boundary
    val m = new AdmmSlim(lambda1 = 0.05, lambda2 = 1.0).fit(blockLog)
    val cross = m.similarity
      .filter((F.col("item_one") < 10 && F.col("item_two") >= 10) ||
        (F.col("item_one") >= 10 && F.col("item_two") < 10)).count()
    assert(cross == 0)
  }

  test("l1 regularization monotonically sparsifies; strong l1 empties the model") {
    // l2=10 keeps rho0 high enough that adaptive-rho rescaling cannot
    // defeat the threshold (at extreme l1/l2 RATIOS rho doubles until the
    // threshold no-ops — the reference's dynamics do the same, so the
    // l1≫l2 corner is simply outside the model's sane envelope)
    def nnz(l1: Double) =
      new AdmmSlim(lambda1 = l1, lambda2 = 10.0).fit(blockLog).similarity.count()
    val loose = nnz(0.1)
    val tight = nnz(2.0)
    val strong = nnz(5.0)
    assert(tight <= loose, s"nnz($tight) should not exceed nnz($loose)")
    assert(strong == 0L, s"strong l1 kept $strong cells")
    assert(loose > 0L)
  }

  test("predict inherits the NeighbourRec path: k-bounded, seen filtered") {
    val m = new AdmmSlim(lambda1 = 0.05, lambda2 = 1.0).fit(blockLog)
    val recs = m.predict(blockLog, k = 2)
    assert(recs.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ <= 2))
    assert(recs.join(blockLog, Seq("query_id", "item_id"), "left_semi").count() == 0)
    // cluster discipline carries into prediction
    assert(recs.filter($"query_id" < 10 && $"item_id" >= 10).count() == 0)
  }

  test("maxItems contract fails fast instead of inflating the driver") {
    val e = intercept[IllegalStateException] {
      new AdmmSlim(maxItems = 2).fit(blockLog)
    }
    assert(e.getMessage.contains("maxItems"))
  }

  test("save/load round-trips through the neighbour family") {
    val m = new AdmmSlim(lambda1 = 0.05, lambda2 = 1.0).fit(blockLog)
    val dir = java.nio.file.Files.createTempDirectory("admm").toString
    ModelIO.saveNeighbour(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[AdmmSlim]
    val a = m.predict(blockLog, 2).orderBy("query_id", "item_id")
      .collect().toSeq
    val b = back.predict(blockLog, 2).orderBy("query_id", "item_id")
      .collect().toSeq
    assert(a == b)
  }

  test("l1=0 fixpoint equals the closed-form zero-diagonal ridge (Steck)") {
    // independent math: with no l1 term and ρ PINNED (multiplicator = 1 —
    // adaptive ρ against the stale inverse shifts the effective ridge to
    // λ₂+ρ₀−ρ, a documented reference quirk) the ADMM fixpoint solves
    // (G + λ₂I)B = G with a diagonal Lagrangian, i.e. the closed-form
    // zero-diag ridge  B = P·G − P·diag(γ), γ_j = (P·G)_jj / P_jj,
    // P = (G + λ₂I)⁻¹ — computed here directly from the same Gram, no
    // ADMM code involved.
    import breeze.linalg.{inv, DenseMatrix}
    val lambda2 = 5.0
    val m = new AdmmSlim(lambda1 = 0.0, lambda2 = lambda2,
      epsAbs = 1e-9, epsRel = 1e-9, maxIteration = 3000,
      multiplicator = 1.0)
    m.fit(blockLog)
    val sim = m.similarity.as[(Long, Long, Double)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    // rebuild G from the log directly (items 0,1,2,10,11,12)
    val ids = Seq(0L, 1L, 2L, 10L, 11L, 12L)
    val idx = ids.zipWithIndex.toMap
    val rows = blockLog.select("query_id", "item_id")
      .as[(Long, Long)].collect()
    val byUser = rows.groupBy(_._1).values.toSeq
    val g = DenseMatrix.zeros[Double](6, 6)
    byUser.foreach { us =>
      val is = us.map(u => idx(u._2))
      for (a <- is; b <- is) g(a, b) += 1.0
    }
    val p = inv(g + DenseMatrix.eye[Double](6) * lambda2)
    val pg: DenseMatrix[Double] = p * g
    val closed = DenseMatrix.zeros[Double](6, 6)
    for (j <- 0 until 6) {
      val gamma = pg(j, j) / p(j, j)
      for (i <- 0 until 6) closed(i, j) = pg(i, j) - p(i, j) * gamma
    }
    for (i <- 0 until 6; j <- 0 until 6 if i != j) {
      val admm = sim.getOrElse((ids(i), ids(j)), 0.0)
      assert(math.abs(admm - closed(i, j)) < 1e-5,
        s"cell (${ids(i)},${ids(j)}): admm=$admm closed=${closed(i, j)}")
    }
  }

  test("converges before maxIteration on a well-conditioned log") {
    val m = new AdmmSlim(lambda1 = 0.05, lambda2 = 1.0, maxIteration = 100)
    m.fit(blockLog)
    assert(m.lastIterations < 100, s"did not converge: ${m.lastIterations}")
  }
}
