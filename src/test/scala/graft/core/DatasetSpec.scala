package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import graft.preprocessing.{LabelEncoder, SequenceEncoder, MergeSubsets}

class DatasetSpec extends SparkSpec {
  import spark.implicits._

  def log = Seq((0L, 0L, 1.0), (1L, 1L, 2.0)).toDF("query_id", "item_id", "rating")

  test("RsDataset save/load roundtrip preserves rows and order") {
    val dir = java.nio.file.Files.createTempDirectory("rsds").toString
    val qf = Seq((0L, 0.5), (1L, 0.7)).toDF("query_id", "f1")
    RsDataset(log, queryFeatures = Some(qf)).save(dir)
    val loaded = RsDataset.load(spark, dir)
    assert(loaded.interactions.collect().map(_.toSeq).toSet ==
      log.collect().map(_.toSeq).toSet)
    assert(loaded.queryFeatures.get.count() == 2)
    assert(loaded.itemFeatures.isEmpty)
  }

  test("RsDataset consistency check counts missing feature ids") {
    val qf = Seq((0L, 0.5)).toDF("query_id", "f1") // user 1 missing
    val ds = RsDataset(log, queryFeatures = Some(qf))
    assert(ds.inconsistentIds("query_id") == 1L)
    assert(ds.checkEncoded())
  }

  test("FeatureSchema algebra filters by type, source, hint") {
    import FeatureType._, FeatureSource._, FeatureHint._
    val fs = FeatureSchema(Seq(
      FeatureInfo("query_id", Categorical, Interactions, Some(QueryId)),
      FeatureInfo("item_id", Categorical, Interactions, Some(ItemId)),
      FeatureInfo("price", Numerical, ItemFeatures),
      FeatureInfo("tags", CategoricalList, ItemFeatures),
    ))
    assert(fs.filter(source = Some(ItemFeatures)).columns == Seq("price", "tags"))
    assert(fs.filter(featureType = Some(CategoricalList)).columns == Seq("tags"))
    assert(fs.drop(hint = Some(QueryId)).columns.size == 3)
    assert(fs.queryIdColumn.contains("query_id"))
    val errors = fs.validate(log.schema)
    assert(errors.exists(_.contains("price"))) // missing physical column
  }

  test("SequenceEncoder preserves element order through the map expression") {
    val enc = LabelEncoder.fit(Seq(10L, 20L, 30L).toDF("x"), "x")
    val df = Seq((1L, Seq(30L, 10L, 20L))).toDF("id", "xs")
    val out = SequenceEncoder.transform(enc, df, "xs")
    assert(out.first().getSeq[Long](1) == Seq(2L, 0L, 1L))
    val out2 = SequenceEncoder.transformViaJoin(enc, df, "xs", Seq("id"))
    assert(out2.select("xs").first().getSeq[Long](0) == Seq(2L, 0L, 1L))
  }

  test("MergeSubsets policies: drop, ignore, error") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((2L, "y"), (3L, "z")).toDF("id", "v")
    assert(MergeSubsets.merge(Seq(a, b), MergeSubsets.DropDuplicates, Seq("id")).count() == 3)
    assert(MergeSubsets.merge(Seq(a, b), MergeSubsets.IgnoreDuplicates, Seq("id")).count() == 4)
    intercept[IllegalArgumentException] {
      MergeSubsets.merge(Seq(a, b), MergeSubsets.ErrorOnDuplicates, Seq("id"))
    }
  }

  test("sampleTopK samples k per user, deterministic, weight-sensitive") {
    val scores = Seq(
      (0L, 0L, 100.0), (0L, 1L, 1.0), (0L, 2L, 1.0),
      (1L, 0L, 1.0), (1L, 1L, 1.0),
    ).toDF("query_id", "item_id", "rating")
    val s1 = Ops.sampleTopK(scores, 1, seed = 42).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = Ops.sampleTopK(scores, 1, seed = 42).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 == s2 && s1.size == 2)
    // heavy weight dominates: item 0 should win for user 0 across most seeds
    val wins = (0 until 20).count { s =>
      Ops.sampleTopK(scores, 1, seed = s).collect()
        .exists(r => r.getLong(0) == 0L && r.getLong(1) == 0L)
    }
    assert(wins >= 15)
  }

  test("bucketed sink writes a shuffle-free joinable table") {
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    Session.writeBucketed(log, "bucketed_log_test", "query_id", 4,
      path = Some(s"$dir/bucketed_log_test"))
    val t = spark.table("bucketed_log_test")
    assert(t.count() == 2)
    spark.sql("DROP TABLE bucketed_log_test")
  }

  test("logInfo and subset mirror the reference Dataset helpers") {
    import org.apache.spark.sql.functions.lit
    val ds = RsDataset(
      interactions = log.withColumn("rating", lit(1.0)),
      queryFeatures = Some(log.select("query_id").distinct()
        .withColumn("f1", lit(2.0)).withColumn("f2", lit(3.0))))
    // reference doctest format (spark_utils.py:325-359)
    val expectedUsers = log.select("query_id").distinct().count()
    val expectedItems = log.select("item_id").distinct().count()
    assert(ds.logInfo ==
      s"total lines: ${log.count()}, total users: $expectedUsers, " +
        s"total items: $expectedItems")
    assert(ds.queryCount == expectedUsers && ds.itemCount == expectedItems)
    val sub = ds.subset(Seq("f1"))
    // ids always survive; rating and f2 are dropped
    assert(sub.interactions.columns.toSet == Set("query_id", "item_id"))
    assert(sub.queryFeatures.get.columns.toSet == Set("query_id", "f1"))
  }

  test("bucketed-bucketed join on the bucket key plans with no shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("wh2").toString
    Session.writeBucketed(log, "bk_a", "query_id", 4, path = Some(s"$dir/a"))
    Session.writeBucketed(log, "bk_b", "query_id", 4, path = Some(s"$dir/b"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("bk_a").join(
        spark.table("bk_b").withColumnRenamed("item_id", "i2")
          .withColumnRenamed("rating", "r2"), "query_id")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // co-located buckets: the sort-merge join must read both sides
      // in place — an Exchange here means bucketing didn't line up
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bk_a"); spark.sql("DROP TABLE bk_b")
    }
  }
}
