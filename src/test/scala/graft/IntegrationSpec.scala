package graft

import org.apache.spark.sql.{functions => F}
import java.sql.Timestamp
import graft.core.{Ops, RsDataset}
import graft.preprocessing._
import graft.splitters.RatioSplitter
import graft.models.ItemKNN
import graft.metrics.Metrics

/** End-to-end pipeline chaining every layer on one fixture: filters →
  * sessionizer → dataset → split → encode → model → metrics — the seams
  * the per-operator specs don't cross. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("full pipeline: filter -> sessionize -> split -> encode -> knn -> metrics") {
    val rnd = new scala.util.Random(11)
    val raw = (0 until 400).map { i =>
      val user = rnd.nextInt(8).toLong
      (user, 100L + rnd.nextInt(12).toLong, 1.0 + rnd.nextInt(4),
        ts(rnd.nextInt(50)))
    }.toDF("query_id", "item_id", "rating", "timestamp")

    // 1. preprocessing chain
    val filtered = MinCountFilter(5, "query_id").transform(
      LowRatingFilter(1.0).transform(raw))
    val sessionized = Sessionizer(sessionGapSec = 600, userCol = "query_id",
      tsCol = "timestamp", tieCol = Some("item_id")).transform(filtered)
    assert(sessionized.columns.contains("session_seq"))

    // 2. dataset + encoder
    val enc = LabelEncoder.fit(sessionized, "item_id")
    val encoded = enc.transform(sessionized)
    val ds = RsDataset(encoded)
    assert(ds.checkEncoded())

    // 3. split
    val (train, test) = RatioSplitter(0.25, tieCol = Some("item_id")).split(encoded)
    assert(train.count() + test.count() == encoded.count())

    // 4. model + metrics
    val recs = new ItemKNN(numNeighbours = 5).fit(train).predict(train, k = 5)
    assert(recs.groupBy("query_id").count().select("count")
      .as[Long].collect().forall(_ <= 5))
    val gt = test.select("query_id", "item_id").distinct()
    val m = Metrics.compute(recs, gt,
      Seq("hit_rate", "ndcg", "precision"), Seq(5)).first()
    (0 until 3).foreach { i =>
      val v = m.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"metric $i out of range: $v")
    }

    // 5. decode back to raw item ids
    val decoded = enc.inverseTransform(recs)
    val origItems = raw.select("item_id").as[Long].collect().toSet
    assert(decoded.select("item_id").as[Long].collect().toSet.subsetOf(origItems))
  }
}
