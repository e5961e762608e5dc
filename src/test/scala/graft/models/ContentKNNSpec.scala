package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ContentKNNSpec extends SparkSpec {
  import spark.implicits._

  // item1 {A, X}, item2 {A, Y}, item3 {B, X}
  private def feats = Seq(
    (1L, "A"), (1L, "X"), (2L, "A"), (2L, "Y"), (3L, "B"), (3L, "X"),
  ).toDF("item_id", "feature")

  test("hand golden: one-hot cosine over shared attributes") {
    val m = new ContentKNN(numNeighbours = 5).fitFeatures(feats)
    val s = m.similarity.as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // |F|=2 everywhere: sim = 1/(√2·√2) — NOT 0.5, √2·√2 ≠ 2 in FP
    val exp = 1.0 / (math.sqrt(2.0) * math.sqrt(2.0))
    assert(s((1L, 2L)) == exp && s((2L, 1L)) == exp)
    assert(s((1L, 3L)) == exp && s((3L, 1L)) == exp)
    assert(!s.contains((2L, 3L))) // no shared features → no row
  }

  test("cold items are recommendable: attribute overlap alone scores them") {
    val m = new ContentKNN(numNeighbours = 5).fitFeatures(feats)
    // the log has ONLY item1 — items 2 and 3 are fully cold
    val log = Seq((7L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val recs = m.predict(log, k = 5)
      .orderBy("item_id").as[(Long, Long, Double)].collect().toSeq
    assert(recs == Seq((7L, 2L, 0.5), (7L, 3L, 0.5)))
  }

  test("feature audience cap is deterministic and bounds the fan-out") {
    val wide = (1L to 20L).map(i => (i, "common")).toDF("item_id", "feature")
    val a = new ContentKNN(maxFeatureAudience = 5).fitFeatures(wide)
    val b = new ContentKNN(maxFeatureAudience = 5)
      .fitFeatures(wide.repartition(7))
    assert(a.similarity.count() == 5 * 4)
    assert(a.similarity.orderBy("item_one", "item_two").collect().toSeq ==
      b.similarity.orderBy("item_one", "item_two").collect().toSeq)
  }

  test("fit(log) refuses; fitFeatures is the entry point") {
    intercept[UnsupportedOperationException] {
      new ContentKNN().fit(feats.withColumnRenamed("feature", "query_id")
        .withColumn("rating", F.lit(1.0)))
    }
  }

  test("save/load round-trips") {
    val m = new ContentKNN(numNeighbours = 2).fitFeatures(feats)
    val dir = java.nio.file.Files.createTempDirectory("contentknn").toString
    ModelIO.save(m, dir)
    val back = ModelIO.load(spark, dir).asInstanceOf[ContentKNN]
    assert(back.numNeighbours == 2)
    val log = Seq((7L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    assert(m.predict(log, 3).orderBy("item_id").collect().toSeq ==
      back.predict(log, 3).orderBy("item_id").collect().toSeq)
  }
}
