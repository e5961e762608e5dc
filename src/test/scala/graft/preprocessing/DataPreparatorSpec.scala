package graft.preprocessing

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Pins DataPreparator / CatFeaturesTransformer / ToNumericFeatureTransformer
  * against the reference doctests and branch semantics
  * (data_preparator.py:406-830). */
class DataPreparatorSpec extends SparkSpec {
  import spark.implicits._

  test("DataPreparator doctest: rename + absent relevance/timestamp defaults") {
    val log = Seq((2L, 1L, 5L), (2L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L))
      .toDF("user", "item_id", "rel")
    val out = new DataPreparator().transform(
      Map("user_id" -> "user", "item_id" -> "item_id", "relevance" -> "rel"),
      log)
    assert(out.columns.toSet ==
      Set("user_id", "item_id", "relevance", "timestamp"))
    assert(out.schema("relevance").dataType.typeName == "double")
    assert(out.schema("timestamp").dataType.typeName == "timestamp")
    val r = out.filter($"user_id" === 1L).first()
    assert(r.getDouble(out.columns.indexOf("relevance")) == 5.0)
    assert(r.getTimestamp(out.columns.indexOf("timestamp")).toString
      .startsWith("2099-01-01"))
  }

  test("DataPreparator: feature frame renames only; one id key required") {
    val feats = Seq(("user1", "feature1", "2019-01-01"))
      .toDF("user", "f0", "ts")
    val out = new DataPreparator().transform(Map("user_id" -> "user"), feats)
    assert(out.columns.toSeq == Seq("user_id", "f0", "ts"))
    assert(out.schema("ts").dataType.typeName == "string") // untouched
    intercept[IllegalArgumentException] {
      new DataPreparator().transform(Map("relevance" -> "f0"), feats)
    }
  }

  test("DataPreparator timestamp coercion: unix numeric, string parse, empty/missing errors") {
    val unixLog = Seq((1L, 2L, 1546300800L)).toDF("u", "i", "ts")
    val t1 = new DataPreparator().transform(
      Map("user_id" -> "u", "item_id" -> "i", "timestamp" -> "ts"), unixLog)
    assert(t1.first().getTimestamp(t1.columns.indexOf("timestamp")).toInstant
      .getEpochSecond == 1546300800L)
    val strLog = Seq((1L, 2L, "2019/01/01")).toDF("u", "i", "ts")
    val t2 = new DataPreparator().transform(
      Map("user_id" -> "u", "item_id" -> "i", "timestamp" -> "ts"), strLog,
      dateFormat = Some("yyyy/MM/dd"))
    assert(t2.first().getTimestamp(t2.columns.indexOf("timestamp")).toString
      .startsWith("2019-01-01"))
    intercept[IllegalArgumentException] {
      new DataPreparator().transform(Map("user_id" -> "u", "item_id" -> "i"),
        unixLog.limit(0))
    }
    intercept[IllegalArgumentException] {
      new DataPreparator().transform(
        Map("user_id" -> "nope", "item_id" -> "i"), unixLog)
    }
  }

  test("DataPreparator.read: csv with header + json round the file path contract") {
    val dir = java.nio.file.Files.createTempDirectory("dp_read")
    val csv = dir.resolve("log.csv")
    java.nio.file.Files.writeString(csv, "user,item,rel\n1,2,5\n3,4,1\n")
    val dp = new DataPreparator()
    val raw = dp.read(spark, csv.toString, "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(raw.count() == 2 && raw.columns.toSeq == Seq("user", "item", "rel"))
    val out = dp.transform(
      Map("user_id" -> "user", "item_id" -> "item", "relevance" -> "rel"), raw)
    assert(out.columns.toSet == Set("user_id", "item_id", "relevance", "timestamp"))
    val json = dir.resolve("log.json")
    java.nio.file.Files.writeString(json,
      """{"user": 1, "item": 2}""" + "\n" + """{"user": 3, "item": 4}""" + "\n")
    assert(dp.read(spark, json.toString, "json").count() == 2)
    intercept[IllegalArgumentException] {
      dp.read(spark, csv.toString, "avro")
    }
  }

  test("CatFeaturesTransformer: one column per (col, value), unseen maps to zeros") {
    val train = Seq(("a", "x"), ("b", "y"), ("a", "y")).toDF("c1", "keep")
    val t = new CatFeaturesTransformer(Seq("c1")).fit(train)
    val out = t.transform(Seq(("a", "x"), ("c", "z")).toDF("c1", "keep"))
    assert(out.columns.toSeq == Seq("keep", "ohe_c1_a", "ohe_c1_b"))
    val rows = out.orderBy("keep").collect()
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 0) // "a"
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0) // unseen "c"
  }

  test("ToNumericFeatureTransformer: threshold gates OHE vs drop; column check") {
    val df = Seq(
      (1L, 1.5, "a", "u1"), (2L, 2.5, "b", "u2"), (3L, 3.5, "a", "u3"),
    ).toDF("item_id", "num", "smallcat", "bigcat")
    val t = new ToNumericFeatureTransformer(threshold = Some(2)).fit(df)
    assert(t.colsToOhe == Seq("smallcat") && t.colsToDel == Seq("bigcat"))
    val out = t.transform(df)
    assert(out.columns.toSet ==
      Set("item_id", "num", "ohe_smallcat_a", "ohe_smallcat_b"))
    intercept[IllegalArgumentException] {
      t.transform(df.withColumnRenamed("num", "other"))
    }
    // threshold None encodes everything non-numeric
    val all = new ToNumericFeatureTransformer(threshold = None).fit(df)
    assert(all.colsToOhe.toSet == Set("smallcat", "bigcat"))
  }
}
