package graft.splitters

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp
import java.nio.file.Files

/** Splitter persistence round trips (reference
  * tests/splitters/test_save_load_splitters.py): for every splitter,
  * load(save(s)) == s (case-class equality — all config, no state) and
  * split-after-load produces byte-identical train/test row sets.
  */
class SplitterIOSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  def log: DataFrame = Seq(
    (0L, 0L, ts("2024-01-01 10:00:00")), (0L, 1L, ts("2024-01-02 10:00:00")),
    (0L, 2L, ts("2024-01-03 10:00:00")), (0L, 3L, ts("2024-01-04 10:00:00")),
    (0L, 4L, ts("2024-01-05 10:00:00")),
    (1L, 0L, ts("2024-01-02 10:00:00")), (1L, 1L, ts("2024-01-06 10:00:00")),
    (2L, 2L, ts("2024-01-07 10:00:00")),
  ).toDF("query_id", "item_id", "timestamp")

  private def rows(df: DataFrame): Set[(Long, Long, Timestamp)] =
    df.select("query_id", "item_id", "timestamp")
      .as[(Long, Long, Timestamp)].collect().toSet

  private def roundTrip(s: Splitter): Unit = {
    val dir = Files.createTempDirectory("splitter_io").toString
    SplitterIO.save(s, dir)
    val loaded = SplitterIO.load(dir)
    assert(loaded == s, s"config round trip broke: $s -> $loaded")
    val (t1, v1) = s.split(log)
    val (t2, v2) = loaded.split(log)
    assert(rows(t1) == rows(t2) && rows(v1) == rows(v2),
      s"split-after-load diverged for $s")
  }

  // non-default flags/columns everywhere, so a loader that silently falls
  // back to defaults cannot pass
  test("all 8 Splitter configs round-trip and re-split identically") {
    Seq[Splitter](
      RatioSplitter(0.4, dropColdItems = true),
      RatioSplitter(0.25, tieCol = None, dropColdUsers = true),
      LastNSplitter(2, dropColdUsers = true),
      LastNSplitter(86400 * 2, byTimeSeconds = true),
      TimeSplitter("2024-01-04 00:00:00", dropColdItems = true),
      HashRandomSplitter(0.5, seed = 7, keyCols = Seq("query_id", "item_id")),
      NewUsersSplitter(0.34),
      ColdUserSplitter(0.34, seed = 9, dropColdItems = true),
      TwoStageSplitter(0.5, 0.4, seed = 5),
      RandomNextNSplitter(1, seed = 3, tieCol = None),
    ).foreach(roundTrip)
  }

  test("KFolds persists through its own loader and reassigns identically") {
    val k = KFolds(3, seed = 11)
    val dir = Files.createTempDirectory("kfolds_io").toString
    SplitterIO.save(k, dir)
    val loaded = SplitterIO.loadKFolds(dir)
    assert(loaded == k)
    val a = k.assign(log, Seq("item_id")).select("query_id", "item_id", "fold")
      .as[(Long, Long, Long)].collect().toSet
    val b = loaded.assign(log, Seq("item_id")).select("query_id", "item_id", "fold")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException](SplitterIO.load(dir))
  }

  test("loader rejects unknown kinds and comma-bearing key columns") {
    val dir = Files.createTempDirectory("splitter_bad").toString
    graft.models.ModelIO.writeJson(dir, Map("kind" -> "mystery",
      "queryCol" -> "q", "itemCol" -> "i",
      "dropColdItems" -> "false", "dropColdUsers" -> "false"))
    intercept[IllegalArgumentException](SplitterIO.load(dir))
    intercept[IllegalArgumentException] {
      SplitterIO.save(HashRandomSplitter(0.5, keyCols = Seq("a,b")), dir)
    }
  }
}
