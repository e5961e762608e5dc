package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** get_nearest_items parity (reference base_rec.py:631-777,
  * base_neighbour_rec.py:144-188): vector-path metrics against a
  * driver-side brute force, candidates-filter edge, and the
  * similarity-table path's tie-break.
  */
class NearestItemsSpec extends SparkSpec {
  import spark.implicits._

  // 5 items, 3 dims — hand-checkable; item 4 duplicates item 1's direction
  // at twice the magnitude (cosine tie, dot difference)
  val vecs = Seq(
    (1L, Seq(1.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0)),
    (3L, Seq(1.0, 1.0, 0.0)),
    (4L, Seq(2.0, 0.0, 0.0)),
    (5L, Seq(0.0, 0.0, 1.0)),
  ).toDF("item_id", "vec")

  private def bruteExpected(metric: String, anchors: Seq[Long], k: Int,
      candidates: Option[Set[Long]] = None): Set[(Long, Long)] = {
    val m = Map(
      1L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.0, 1.0, 0.0),
      3L -> Seq(1.0, 1.0, 0.0), 4L -> Seq(2.0, 0.0, 0.0),
      5L -> Seq(0.0, 0.0, 1.0))
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def rel(a: Seq[Double], b: Seq[Double]) = metric match {
      case "dot_product"       => dot(a, b)
      case "cosine_similarity" => dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      case "euclidean_distance_sim" =>
        1.0 / (1.0 + math.sqrt(dot(a, a) + dot(b, b) - 2 * dot(a, b)))
    }
    anchors.flatMap { a =>
      m.keys.toSeq.filter(_ != a)
        .filter(i => candidates.forall(_.contains(i)))
        .map(i => (i, rel(m(a), m(i))))
        // reference tie-break: rel desc, neighbour id desc
        .sortBy { case (i, r) => (-r, -i) }
        .take(k).map { case (i, _) => (a, i) }
    }.toSet
  }

  private def got(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("item_id", "neighbour_item_id").as[(Long, Long)].collect().toSet

  test("fromVectors matches brute force for all three metrics") {
    val anchors = Seq(1L, 3L, 5L).toDF("item_id")
    for (metric <- NearestItems.vectorMetrics) {
      val out = NearestItems.fromVectors(vecs, "item_id", "vec", anchors, 2, metric)
      assert(got(out) == bruteExpected(metric, Seq(1L, 3L, 5L), 2),
        s"metric $metric diverged from brute force")
    }
  }

  test("fromVectors cosine tie between parallel vectors breaks by higher id") {
    // anchor 3 = (1,1,0): items 1, 2 and 4 all sit at cosine 1/√2 —
    // reference orders (similarity DESC, id DESC), so the crop keeps 4, 2
    val out = NearestItems.fromVectors(vecs, "item_id", "vec",
      Seq(3L).toDF("item_id"), 2, "cosine_similarity")
    assert(got(out) == Set((3L, 4L), (3L, 2L)))
  }

  test("fromVectors candidates filter restricts the neighbour pool pre-crop") {
    val out = NearestItems.fromVectors(vecs, "item_id", "vec",
      Seq(1L).toDF("item_id"), 3, "dot_product",
      candidates = Some(Seq(2L, 5L).toDF("item_id")))
    assert(got(out) == bruteExpected("dot_product", Seq(1L), 3, Some(Set(2L, 5L))))
    // anchor excluded from its own neighbours even when listed as candidate
    val self = NearestItems.fromVectors(vecs, "item_id", "vec",
      Seq(1L).toDF("item_id"), 5, "dot_product",
      candidates = Some(Seq(1L, 4L).toDF("item_id")))
    assert(got(self) == Set((1L, 4L)))
  }

  test("fromVectors rejects unknown metrics") {
    intercept[IllegalArgumentException] {
      NearestItems.fromVectors(vecs, "item_id", "vec",
        Seq(1L).toDF("item_id"), 2, "manhattan")
    }
  }

  def log = Seq(
    (0L, 0L, 5.0, "2024-01-01 10:00:00"), (0L, 1L, 4.0, "2024-01-02 10:00:00"),
    (1L, 0L, 5.0, "2024-01-01 11:00:00"), (1L, 2L, 3.0, "2024-01-03 10:00:00"),
    (2L, 1L, 4.0, "2024-01-02 12:00:00"), (2L, 2L, 2.0, "2024-01-04 10:00:00"),
    (3L, 0L, 1.0, "2024-01-05 10:00:00"),
  ).toDF("query_id", "item_id", "rating", "timestamp")
    .withColumn("timestamp", F.to_timestamp($"timestamp"))

  test("Word2VecRec.getNearestItems equals fromVectors over its item vectors") {
    val m = new Word2VecRec(vectorSize = 8, minCount = 1).fit(log)
    val anchors = Seq(0L, 1L).toDF("item_id")
    val viaModel = got(m.getNearestItems(anchors, 2))
    val direct = got(NearestItems.fromVectors(
      m.itemVectors, "item_id", "vec", anchors, 2, "cosine_similarity"))
    assert(viaModel == direct && viaModel.nonEmpty)
    assert(viaModel.forall { case (a, n) => a != n })
  }

  test("ALSRec.getNearestItems returns k neighbours per anchor, no self") {
    val m = new ALSRec(rank = 4, maxIter = 3).fit(log)
    val out = m.getNearestItems(Seq(0L, 2L).toDF("item_id"), 2, "dot_product")
    val rows = got(out)
    assert(rows.size == 4 && rows.forall { case (a, n) => a != n })
    assert(out.columns.toSeq == Seq("item_id", "neighbour_item_id", "dot_product"))
  }

  test("ItemKNN.getNearestItems crops its similarity table with desc tie-break") {
    val m = new ItemKNN(numNeighbours = 5).fit(log)
    val out = m.getNearestItems(Seq(0L).toDF("item_id"), 2)
    // unweighted cosine over this log: sim(0,1)=sim(0,2) (one shared user
    // each, equal norms) → tie broken by HIGHER neighbour id first
    val ordered = out.orderBy(F.desc("similarity"), F.desc("neighbour_item_id"))
      .select("neighbour_item_id").as[Long].collect().toSeq
    assert(ordered == Seq(2L, 1L))
    val withCand = m.getNearestItems(Seq(0L).toDF("item_id"), 2,
      candidates = Some(Seq(1L).toDF("item_id")))
    assert(got(withCand) == Set((0L, 1L)))
  }

  test("AssociationRules.getNearestItems validates metric and reads full rules") {
    val sess = log.withColumn("session_id", $"query_id")
    val m = new AssociationRules(minItemCount = 1, minPairCount = 1).fit(sess)
    val byLift = m.getNearestItems(Seq(0L).toDF("item_id"), 2, "lift", None)
    assert(byLift.columns.contains("lift") && byLift.count() > 0)
    val byGain = m.getNearestItems(Seq(0L).toDF("item_id"), 2, "confidence_gain", None)
    assert(byGain.columns.contains("confidence_gain"))
    intercept[IllegalArgumentException] {
      m.getNearestItems(Seq(0L).toDF("item_id"), 2, "support", None)
    }
  }
}
