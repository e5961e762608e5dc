package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key k appears k times, k = 1..20 (210 rows)
  private def stream = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    .toDF("item_id")

  private def estimates(depth: Int, width: Int): Map[Long, Long] = {
    val counters = Sketch.cmsCounters(stream, "item_id", depth, width)
    val keys = stream.distinct()
    Sketch.cmsEstimate(counters, keys, "item_id", depth, width)
      .as[(Long, Long)].collect().toMap
  }

  test("CMS never underestimates, at any width") {
    val exact = (1 to 20).map(k => k.toLong -> k.toLong).toMap
    for (width <- Seq(4, 16, 1024)) {
      val est = estimates(depth = 4, width = width)
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"width=$width key=$k est=${est(k)} < exact=$n")
      }
    }
  }

  test("CMS is exact when the sketch is wide enough to avoid collisions") {
    // 20 keys into 4×1024 cells: collision within EVERY row is vanishingly
    // unlikely under the seeded hash family — and deterministic, so this
    // either always passes or never does
    val exact = (1 to 20).map(k => k.toLong -> k.toLong).toMap
    assert(estimates(depth = 4, width = 1024) == exact)
  }

  test("CMS counters merge by per-cell addition (shard-parallel build)") {
    val (a, b) = (stream.filter($"item_id" <= 10), stream.filter($"item_id" > 10))
    val merged = Sketch.cmsCounters(a, "item_id", 4, 16)
      .unionAll(Sketch.cmsCounters(b, "item_id", 4, 16))
      .groupBy("row", "bucket").agg(F.sum("counter").as("counter"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.cmsCounters(stream, "item_id", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("CMS total mass per row equals the stream size") {
    val perRow = Sketch.cmsCounters(stream, "item_id", 4, 16)
      .groupBy("row").agg(F.sum("counter").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow == (0 until 4).map(_ -> 210L).toMap)
  }
}
