package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class EaseSpec extends SparkSpec {
  import spark.implicits._

  // X = [[1,1],[1,0]] (u0 -> {0,1}, u1 -> {0})
  private def tinyLog = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 0L, 1.0))
    .toDF("query_id", "item_id", "rating")

  private def blockLog = Seq(
    (0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L),
    (3L, 2L), (3L, 0L),
    (10L, 10L), (10L, 11L), (11L, 11L), (11L, 12L), (12L, 10L), (12L, 12L),
    (13L, 10L), (13L, 11L), (13L, 12L),
  ).map { case (q, i) => (q, i, 1.0) }.toDF("query_id", "item_id", "rating")

  test("closed form matches the hand-computed 2-item golden") {
    // G = [[2,1],[1,1]], λ=1 ⇒ G+λI = [[3,1],[1,2]], P = [[2,-1],[-1,3]]/5
    // B = I − P·diagMat(1/diag P): B₁₀ = 1/2, B₀₁ = 1/3, diagonal 0
    val m = new Ease(lambda = 1.0).fit(tinyLog)
    val sims = m.similarity.as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(sims((1L, 0L)) - 0.5) < 1e-12)
    assert(math.abs(sims((0L, 1L)) - 1.0 / 3.0) < 1e-12)
    assert(!sims.contains((0L, 0L)) && !sims.contains((1L, 1L)),
      "zero diagonal is not emitted")
    assert(m.lastKktResidual < 1e-12)
  }

  test("predict golden: one-item history scores the EASE weight") {
    val m = new Ease(lambda = 1.0).fit(tinyLog)
    // u1 saw item 0 only ⇒ the single unseen candidate is item 1 with
    // score B₀→₁ = 1/3 (rounded to 9 decimals by the NeighbourRec path)
    val r = m.predict(tinyLog, k = 5)
      .filter($"query_id" === 1L).as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 1L, 0.333333333)))
  }

  test("fit is deterministic, diagonal-free, finite, KKT-certified") {
    def sims() = new Ease(lambda = 5.0).fit(blockLog)
      .similarity.orderBy("item_one", "item_two")
      .as[(Long, Long, Double)].collect().toSeq
    val a = sims()
    assert(a.nonEmpty)
    assert(!a.exists { case (i, j, _) => i == j }, "diagonal must not be emitted")
    assert(a.forall(t => !t._3.isNaN && !t._3.isInfinite))
    assert(a == sims()) // exact Gram + one fixed-order driver pass
    val m = new Ease(lambda = 5.0).fit(blockLog)
    assert(m.lastKktResidual < 1e-9, s"KKT residual ${m.lastKktResidual}")
  }

  test("block-structured log learns zero cross-cluster similarity") {
    val m = new Ease(lambda = 5.0).fit(blockLog)
    val cross = m.similarity
      .filter((F.col("item_one") < 10 && F.col("item_two") >= 10) ||
        (F.col("item_one") >= 10 && F.col("item_two") < 10)).count()
    assert(cross == 0)
  }

  test("EASE signature: negative weights present; λ shrinks the norm") {
    // explaining-away chain u1{0,1}, u2{1,2}: items 0 and 2 co-occur only
    // through the confounder 1, so B₀₂ = B₂₀ = −0.2 at λ=1 (hand-solved)
    val chain = Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L))
      .map { case (q, i) => (q, i, 1.0) }.toDF("query_id", "item_id", "rating")
    val m = new Ease(lambda = 1.0).fit(chain)
    val sims = m.similarity.as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(sims((0L, 2L)) + 0.2) < 1e-12)
    assert(math.abs(sims((2L, 0L)) + 0.2) < 1e-12)
    val loose = new Ease(lambda = 1.0).fit(blockLog)
    val tight = new Ease(lambda = 100.0).fit(blockLog)
    assert(tight.lastFrobenius < loose.lastFrobenius)
  }

  test("maxItems contract fails fast instead of inflating the driver") {
    val e = intercept[IllegalStateException] {
      new Ease(maxItems = 2).fit(blockLog)
    }
    assert(e.getMessage.contains("maxItems"))
  }

  test("save/load round-trips through the neighbour family") {
    val m = new Ease(lambda = 5.0).fit(blockLog)
    val dir = java.nio.file.Files.createTempDirectory("ease").toString
    ModelIO.save(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[Ease]
    val a = m.predict(blockLog, 2).orderBy("query_id", "item_id").collect().toSeq
    val b = back.predict(blockLog, 2).orderBy("query_id", "item_id").collect().toSeq
    assert(a == b)
  }

  test("incremental merge law: user-disjoint Gram cells rebuild the full fit exactly") {
    val m0 = new Ease(lambda = 5.0).fit(blockLog)
    def merged(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val m = new Ease(lambda = 5.0)
      m.fitFromCells(m.mergeCells(
        m.gramCells(blockLog.filter(pred(F.col("query_id")))),
        m.gramCells(blockLog.filter(!pred(F.col("query_id"))))))
      m.similarity.orderBy("item_one", "item_two")
        .as[(Long, Long, Double)].collect().toSeq
    }
    val full = m0.similarity.orderBy("item_one", "item_two")
      .as[(Long, Long, Double)].collect().toSeq
    assert(merged(_ % 2 === 0) == full, "even/odd slicing must rebuild exactly")
    assert(merged(_ < 11) == full, "range slicing must rebuild exactly")
  }

  test("optimize() searches the ln-λ border and returns a fitted model") {
    val m = new Ease()
    val borders = m.searchBorders
    assert(borders.keySet == Set("lambda"))
    val w = m.withParams(Map("lambda" -> math.log(42.0)))
    assert(math.abs(w.lambda - 42.0) < 1e-9)
  }
}
