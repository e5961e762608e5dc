package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // tiny interaction fixture in the reference's conftest style
  // (tests/conftest.py:50-60): 3 users, 4 items
  def log = Seq(
    (0L, 0L, 1.0), (0L, 1L, 2.0), (0L, 2L, 2.0),
    (1L, 0L, 3.0), (1L, 2L, 1.0),
    (2L, 3L, 5.0),
  ).toDF("query_id", "item_id", "rating")

  test("topK keeps k rows per partition with deterministic ties") {
    val top1 = Ops.getTopKRecs(log, k = 1)
    // user 0: items 1 and 2 tie at 2.0 → item 1 wins (item asc tie-break)
    assertSameRows(top1, Seq((0L, 1L, 2.0), (1L, 0L, 3.0), (2L, 3L, 5.0)))
  }

  test("topK k larger than group returns whole group") {
    assert(Ops.getTopKRecs(log, k = 10).count() == 6)
  }

  test("filterSeen drops history pairs and crops rank") {
    val history = Seq((0L, 1L), (1L, 0L)).toDF("query_id", "item_id")
    val out = Ops.filterSeen(log, history, k = 2)
    val pairs = out.select("query_id", "item_id").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((0L, 1L)) && !pairs.contains((1L, 0L)))
    assert(pairs.contains((2L, 3L)))
  }

  test("filterCold keeps only referenced ids") {
    val ref = Seq(0L, 3L).toDF("item_id")
    val out = Ops.filterCold(log, ref, "item_id")
    assert(out.select("item_id").as[Long].collect().toSet == Set(0L, 3L))
  }

  test("coldCount counts ids missing from reference") {
    val ref = Seq(0L, 1L).toDF("item_id")
    assert(Ops.coldCount(log, ref, "item_id") == 2) // items 2 and 3
  }

  test("fallbackMerge shifts fallback strictly below main minimum") {
    val main = Seq((0L, 0L, 5.0)).toDF("query_id", "item_id", "rating")
    val fb   = Seq((0L, 0L, 100.0), (0L, 1L, 50.0)).toDF("query_id", "item_id", "rating")
    val got = Ops.fallbackMerge(main, fb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((0L, 0L)) == 5.0)          // main wins on conflict
    assert(got((0L, 1L)) < 5.0)           // fallback shifted below main min
  }

  test("minCountEntities keeps entities with >= n rows") {
    val out = Ops.minCountEntities(log, "query_id", 2L).as[Long].collect().toSet
    assert(out == Set(0L, 1L))
  }

  test("getStats computes one-pass stats") {
    val r = Ops.getStats(log, "rating").first()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 5.0 && r.getLong(3) == 6L)
  }

  test("processTimestampColumn normalizes unix seconds and strings") {
    val fromLong = Ops.processTimestampColumn(
      Seq((1L, 1700000000L)).toDF("id", "ts"), "ts")
    assert(fromLong.schema("ts").dataType.typeName == "timestamp")
    val fromStr = Ops.processTimestampColumn(
      Seq((1L, "2024-01-01 00:00:00")).toDF("id", "ts"), "ts")
    assert(fromStr.schema("ts").dataType.typeName == "timestamp")
    assert(fromStr.filter(F.col("ts").isNull).count() == 0)
  }

  test("horizontalExplode expands fixed-width arrays") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val out = Ops.horizontalExplode(df, "vec", 2, "f")
    assert(out.columns.toSeq == Seq("id", "f_0", "f_1"))
    assert(out.first().getDouble(2) == 2.0)
  }

  test("asofJoin: most recent at-or-before match, strict excludes equal ts") {
    val left = Seq(
      (10L, 1L, 100L), // before any right row -> null
      (11L, 1L, 205L), // between right 200 and 300 -> 200
      (12L, 1L, 300L), // equal ts: inclusive -> 300, strict -> 200
      (13L, 1L, 999L), // far after the last -> 300
      (14L, 2L, 500L), // other key: its own timeline -> 450
      (15L, 3L, 500L), // key with no right rows at all -> null
    ).toDF("id", "k", "lts")
    val right = Seq(
      (1L, 200L, "a"), (1L, 300L, "b"),
      (2L, 450L, "c"), (2L, 600L, "d"),
    ).toDF("k", "rts", "v")

    val inc = Ops.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(inc == Map(10L -> None, 11L -> Some("a"), 12L -> Some("b"),
      13L -> Some("b"), 14L -> Some("c"), 15L -> None))

    val strict = Ops.asofJoin(left, right, "k", "lts", "rts", Seq("v"),
        strict = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(strict(12L) == Some("a")) // equal-ts right row excluded
    assert(strict(11L) == Some("a") && strict(10L).isEmpty)

    // left row count and columns are preserved exactly
    val out = Ops.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
    assert(out.count() == 6 &&
      out.columns.toSeq == Seq("id", "k", "lts", "asof_v"))
  }

  test("rangeJoin: inclusive bounds, overlaps multiply, binning is exact") {
    def t(us: Long) = F.timestamp_micros(F.lit(us))
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 150L),
      (4L, 1L, 1000L), (5L, 2L, 50L))
      .toDF("id", "k", "us")
      .select($"id", $"k", F.timestamp_micros($"us").as("ts"))
    // mixed-length intervals incl. two overlapping at [0,10] and [10,120]:
    // the point AT 10 matches both (inclusive ends)
    val iv = Seq((1L, 0L, 10L, "a"), (1L, 10L, 120L, "b"),
      (1L, 140L, 160L, "c"), (2L, 40L, 60L, "d"))
      .toDF("k", "s", "e", "name")
      .select($"k", F.timestamp_micros($"s").as("start"),
        F.timestamp_micros($"e").as("end"), $"name")
    val out = Ops.rangeJoin(pts, iv, "k", "ts", "start", "end", Seq("name"))
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "c"), (5L, "d")))
    // point 4 (us=1000) is outside every interval: absent from the output
    assert(!out.exists(_._1 == 4L))
  }

  test("keyedCumsum matches the per-key window sum on any layout") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(i =>
      (s"k${rnd.nextInt(7)}", i.toLong, rnd.nextInt(100).toLong))
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("k", "id", "v").repartition(parts)
      val got = Ops.keyedCumsum(df, Seq("k"), "v", "cum", $"id".asc)
        .select($"k", $"id", $"cum").as[(String, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy($"id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = rows.toDF("k", "id", "v")
        .withColumn("cum", F.sum($"v").over(w))
        .select($"k", $"id", $"cum").as[(String, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want, s"layout $parts")
    }
  }

  test("keyedCumsum: SIGNED deltas match the per-key window sum") {
    // the round-8 advisor caught that the old min(cum − value) offset was
    // only correct for non-negative values; the min_by-on-position offset
    // must match the window oracle when within-key prefixes dip negative
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i =>
      (s"k${rnd.nextInt(5)}", i.toLong, (rnd.nextInt(41) - 20).toLong))
    val df = rows.toDF("k", "id", "v").repartition(7)
    val got = Ops.keyedCumsum(df, Seq("k"), "v", "cum", $"id".asc)
      .select($"k", $"id", $"cum").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy($"id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.toDF("k", "id", "v")
      .withColumn("cum", F.sum($"v").over(w))
      .select($"k", $"id", $"cum").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want)
    // deterministic dip below the key's own offset: (+1, −5, +2)
    val dip = Ops.keyedCumsum(
        Seq(("a", 1L, 1L), ("a", 2L, -5L), ("a", 3L, 2L), ("b", 1L, 10L))
          .toDF("k", "id", "v"), Seq("k"), "v", "cum", $"id".asc)
      .select($"k", $"id", $"cum").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(dip == Map(("a", 1L) -> 1L, ("a", 2L) -> -4L, ("a", 3L) -> -2L,
      ("b", 1L) -> 10L))
  }

  test("keyedCumsum: one giant key among many small ones") {
    val rows = (0 until 300).map(i => ("big", i.toLong, 1L)) ++
      Seq(("a", 0L, 5L), ("z", 0L, 7L))
    val got = Ops.keyedCumsum(rows.toDF("k", "id", "v").repartition(5),
        Seq("k"), "v", "cum", $"id".asc)
      .as[(String, Long, Long, Long)].collect()
    val bigMax = got.filter(_._1 == "big").map(_._4).max
    assert(bigMax == 300L)
    assert(got.find(_._1 == "a").get._4 == 5L)
    assert(got.find(_._1 == "z").get._4 == 7L)
  }

  test("intervalJoin equals the theta overlap join, no duplicate pairs") {
    def ts(s: Long) = F.timestamp_micros(F.lit(s * 1000000L))
    val rnd = new scala.util.Random(5)
    // random intervals incl. long ones that span many bins and degenerate points
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val s = rnd.nextInt(2000).toLong
      (rnd.nextInt(3).toLong, i.toLong, s, s + (if (i % 5 == 0) 0L else rnd.nextInt(400).toLong))
    }.toDF(Seq("k", s"${tag}_id", s"${tag}_s", s"${tag}_e"): _*)
      .withColumn(s"${tag}_start", F.timestamp_micros(F.col(s"${tag}_s") * 1000000L))
      .withColumn(s"${tag}_end", F.timestamp_micros(F.col(s"${tag}_e") * 1000000L))
      .drop(s"${tag}_s", s"${tag}_e")
    val l = mk(80, "l")
    val r = mk(60, "r")
    val got = Ops.intervalJoin(l, r, "k", "l_start", "l_end",
        "r_start", "r_end", Seq("r_id"))
      .select("k", "l_id", "r_id").as[(Long, Long, Long)].collect().toSeq
    val want = l.join(r.withColumnRenamed("k", "k2"),
        F.col("k") === F.col("k2") &&
          F.col("l_start") <= F.col("r_end") && F.col("r_start") <= F.col("l_end"))
      .select("k", "l_id", "r_id").as[(Long, Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    assert(got.sorted == want.sorted)
    assert(want.nonEmpty, "fixture produced no overlaps — test is vacuous")
  }

  // ---- saltedJoin -------------------------------------------------------

  // skewed fixture: key 7 holds half the left side
  private def skewLeft = (0 until 400).map { i =>
    (if (i % 2 == 0) 7L else (i % 40).toLong, i.toLong)
  }.toDF("k", "row_id").repartition(6)
  private def skewRight = (0 until 40).map(k => (k.toLong, s"dim$k"))
    .toDF("k", "payload")

  test("saltedJoin: inner/left/semi/anti all equal the unsalted join") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = skewLeft.join(skewRight, Seq("k"), jt)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val salted = Ops.saltedJoin(skewLeft, skewRight, Seq("k"),
          Seq($"row_id"), nSalts = 8, joinType = jt)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(salted == plain, s"joinType=$jt diverged")
    }
    // unmatched left key under LEFT join appears exactly once
    val lonely = Seq((999L, 0L)).toDF("k", "row_id")
    assert(Ops.saltedJoin(lonely, skewRight, Seq("k"), Seq($"row_id"),
      nSalts = 8, joinType = "left").count() == 1)
  }

  test("saltedJoin: salt reaches the join keys; hot key spreads across salts") {
    val salted = skewLeft.withColumn("_salt",
      F.pmod(F.xxhash64($"row_id"), F.lit(8L)))
    val spread = salted.filter($"k" === 7L).select("_salt").distinct().count()
    assert(spread >= 6, s"hot key used only $spread of 8 salt buckets")
    // and the operator's plan joins on k AND _salt (the skew split is real)
    val plan = Ops.saltedJoin(skewLeft, skewRight, Seq("k"), Seq($"row_id"),
      nSalts = 8).queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"no _salt in join plan:\n$plan")
  }

  test("saltedJoin rejects right-preserving join types and salt collisions") {
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(skewLeft, skewRight, Seq("k"), Seq($"row_id"),
        joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(skewLeft.withColumn("_salt", F.lit(1)), skewRight,
        Seq("k"), Seq($"row_id"))
    }
  }

  // ---- applyChanges -----------------------------------------------------

  test("applyChanges: latest change wins; upsert/delete/insert/passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val changes = Seq(
      (1L, "a2", "upsert", 10L),  // update
      (2L, "x", "upsert", 10L),   // overridden by the later delete
      (2L, "gone", "delete", 20L),
      (3L, "zzz", "delete", 10L), // deleted then RE-upserted later
      (3L, "c3", "upsert", 20L),
      (5L, "e", "upsert", 10L),   // insert (key not in base)
      // key 4 untouched → passthrough
    ).toDF("id", "v", "op", "version")
    val out = Ops.applyChanges(base, changes, Seq("id"), "version")
    assert(out.columns.toSeq == Seq("id", "v"))
    assertSameRows(out, Seq((1L, "a2"), (3L, "c3"), (4L, "d"), (5L, "e")))
  }

  test("applyChanges rejects unknown ops instead of silently deleting the key") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val bad = Seq((1L, "a2", "update", 10L)).toDF("id", "v", "op", "version")
    val err = intercept[Exception] {
      Ops.applyChanges(base, bad, Seq("id"), "version").collect()
    }
    assert(err.getMessage.contains("upsert") ||
      Option(err.getCause).exists(_.getMessage.contains("upsert")),
      s"unexpected error: ${err.getMessage}")
  }

  test("applyChanges on an empty feed is the identity") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("id", "v", "op", "version")
    assertSameRows(Ops.applyChanges(base, empty, Seq("id"), "version"),
      Seq((1L, "a")))
  }

  test("percentileRank equals percent_rank over the same total order") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(i => (i.toLong, rnd.nextInt(40).toLong))
      .toDF("id", "score").repartition(5)
    val got = Ops.percentileRank(df, "pct", $"score".asc, $"id".asc)
      .select($"id", $"pct").as[(Long, Double)].collect().toMap
    val want = df.withColumn("pct", F.percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy($"score".asc, $"id".asc)))
      .select($"id", $"pct").as[(Long, Double)].collect().toMap
    assert(got == want)
    // single row → 0.0
    assert(Ops.percentileRank(Seq((1L, 5L)).toDF("id", "score"), "pct",
      $"score".asc).select("pct").as[Double].head() == 0.0)
  }

  test("changesBetween ∘ applyChanges is the identity (round-trip law)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0),
      (4L, "d", 40.0)).toDF("id", "name", "score")
    // next: 1 altered, 2 removed, 3 unchanged (null payload cell), 5 added
    val next = Seq((1L, "a2", 10.0), (3L, null.asInstanceOf[String], 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)).toDF("id", "name", "score")
    val feed = Ops.changesBetween(base, next, Seq("id"))
    // minimal: only the 3 churned keys appear
    assert(feed.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    assert(feed.filter($"op" === "delete").select("id").as[Long].collect()
      .toSeq == Seq(2L))
    val replayed = Ops.applyChanges(base, feed, Seq("id"), "version")
    assert(replayed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq ==
      next.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq)
  }

  test("changesBetween: identical snapshots diff to empty; schema mismatch rejected") {
    val base = Seq((1L, "a")).toDF("id", "v")
    assert(Ops.changesBetween(base, base, Seq("id")).isEmpty)
    intercept[IllegalArgumentException] {
      Ops.changesBetween(base, Seq((1L, "a")).toDF("id", "other"), Seq("id"))
    }
  }

  // ---- deterministicShuffle --------------------------------------------

  test("deterministicShuffle: layout-independent, dense per-shard positions, seed changes the order") {
    val docs = (0 until 500).map(i => (i.toLong, s"doc$i")).toDF("doc_id", "text")
    val a = Ops.deterministicShuffle(docs.repartition(7), Seq("doc_id"), 11L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val b = Ops.deterministicShuffle(docs.repartition(2), Seq("doc_id"), 11L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a == b, "shuffle order depends on input partitioning")
    // positions are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size.toLong),
        s"shard $shard positions not dense")
    }
    // shards are reasonably balanced (uniform hash: each ≈125 of 500)
    val sizes = a.groupBy(_._2).map(_._2.size)
    assert(sizes.min > 80 && sizes.max < 170, s"shard sizes $sizes")
    // a different seed is a different permutation
    val c = Ops.deterministicShuffle(docs, Seq("doc_id"), 12L, 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a != c, "seed does not change the epoch order")
  }

  // ---- writeCompacted ---------------------------------------------------

  test("writeCompacted: file sizing + disjoint sorted ranges + round trip") {
    val dir = java.nio.file.Files.createTempDirectory("compacted").toString
    val df = (0 until 2000).map(i => ((i * 37 % 2000).toLong, "x" * 50))
      .toDF("id", "pad")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
    val target = (est * 0.3 / 4).toLong // aim for ~4 files
    val n = Ops.writeCompacted(df, s"$dir/t", targetFileBytes = target,
      sortCols = Seq($"id".asc))
    assert(n >= 3 && n <= 5, s"expected ~4 files, planned $n")
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == n)
    // round trip preserves the data
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 2000 &&
      back.agg(F.sum("id")).first().getLong(0) ==
        df.agg(F.sum("id")).first().getLong(0))
    // range layout: per-file [min,max] id spans are pairwise disjoint, so
    // footer stats prune whole files on an id predicate
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(F.min("id"), F.max("id")).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $spans")
      case _ =>
    }
  }

  test("writeCompacted survives stats-free RDD-backed lineages (no Int.MaxValue partitions)") {
    // deterministicShuffle's output is RDD-backed: plan stats fall back to
    // Long.MaxValue, which used to plan ceil(2.8e18/target) = Int.MaxValue
    // partitions; the row-count fallback must kick in instead
    val dir = java.nio.file.Files.createTempDirectory("compactrdd").toString
    val df = Ops.deterministicShuffle(
      (0 until 500).map(i => (i.toLong, s"d$i")).toDF("doc_id", "t"),
      Seq("doc_id"), 11L, 2)
    val n = Ops.writeCompacted(df, s"$dir/t", targetFileBytes = 16L << 10)
    assert(n >= 1 && n <= 32, s"unreasonable file count $n for 500 rows")
    assert(spark.read.parquet(s"$dir/t").count() == 500)
  }

  // SCD Type 2 fixture: three keys with interleaved upserts and deletes
  private def scdFeed = Seq(
    (1L, "A", "upsert", 1L), (1L, "B", "upsert", 3L), (1L, "B", "delete", 5L),
    (2L, "C", "upsert", 2L),
    (3L, "D", "upsert", 1L), (3L, "D", "delete", 2L), (3L, "E", "upsert", 4L),
  ).toDF("k", "payload", "op", "version")

  test("scdType2: intervals open on upsert, close on the NEXT change of either op") {
    val h = Ops.scdType2(scdFeed, Seq("k"), "version")
      .select("k", "payload", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(h == Set(
      (1L, "A", 1L, Some(3L), false), (1L, "B", 3L, Some(5L), false),
      (2L, "C", 2L, None, true),
      (3L, "D", 1L, Some(2L), false), (3L, "E", 4L, None, true)))
  }

  test("scdType2 law: snapshotAt(v) equals the applyChanges replay of feed <= v") {
    val h = Ops.scdType2(scdFeed, Seq("k"), "version")
    val empty = Seq.empty[(Long, String)].toDF("k", "payload")
    for (v <- 0L to 6L) {
      val snap = Ops.scdSnapshotAt(h, v)
        .as[(Long, String)].collect().toSet
      val replay = Ops.applyChanges(empty,
        scdFeed.filter(F.col("version") <= v), Seq("k"), "version")
        .as[(Long, String)].collect().toSet
      assert(snap == replay, s"diverged at v=$v: $snap vs $replay")
    }
  }

  test("scdType2 rejects duplicate (key, version) and unknown ops") {
    val dup = Seq((1L, "A", "upsert", 1L), (1L, "B", "upsert", 1L))
      .toDF("k", "payload", "op", "version")
    val e1 = intercept[Exception](
      Ops.scdType2(dup, Seq("k"), "version").collect())
    assert(e1.getMessage.contains("duplicate"))
    val bad = Seq((1L, "A", "merge", 1L)).toDF("k", "payload", "op", "version")
    val e2 = intercept[Exception](
      Ops.scdType2(bad, Seq("k"), "version").collect())
    assert(e2.getMessage.contains("upsert"))
  }

  test("rollingTimeAgg equals the naive self-join on random data; bounds inclusive") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rng = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      (i.toLong, (i % 3).toLong, t(rng.nextInt(5000).toLong),
        rng.nextInt(1000) / 100.0)
    }
    val df = rows.toDF("id", "k", "ts", "v").repartition(5)
    val got = Ops.rollingTimeAgg(df, Seq("k"), "ts", "v", 600L)
      .select("id", "roll_cnt", "roll_sum_cents")
      .as[(Long, Long, Long)].collect().toMap2
    val naive = rows.map { case (id, k, ts, _) =>
      val in = rows.filter { case (_, k2, ts2, _) =>
        k2 == k && ts2.getTime >= ts.getTime - 600000L && ts2.getTime <= ts.getTime }
      id -> ((in.size.toLong, in.map(r => math.round(r._4 * 100)).sum))
    }.toMap
    assert(got == naive)
    // boundary: a row exactly windowSeconds later still sees the first
    val edge = Seq((1L, 0L, t(0), 1.0), (2L, 0L, t(3600), 1.0))
      .toDF("id", "k", "ts", "v")
    val e = Ops.rollingTimeAgg(edge, Seq("k"), "ts", "v", 3600L)
      .select("id", "roll_cnt").as[(Long, Long)].collect().toMap
    assert(e == Map(1L -> 1L, 2L -> 2L))
    // simultaneous rows are RANGE peers: both see both
    val tie = Seq((1L, 0L, t(10), 1.0), (2L, 0L, t(10), 2.0))
      .toDF("id", "k", "ts", "v")
    val g = Ops.rollingTimeAgg(tie, Seq("k"), "ts", "v", 60L)
      .select("id", "roll_cnt", "roll_sum_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(g == Set((1L, 2L, 300L), (2L, 2L, 300L)))
  }

  test("aggMerge(summary(A), summary(B)) equals summary(A ∪ B) incl. negatives") {
    val all = (1L to 300L).map(i => (i % 17, (i * 31) % 101 - 50))
    val (a, b) = all.partition(r => r._2 % 3 == 0)
    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "v").repartition(5)
    val merged = Ops.aggMerge(
      Ops.aggSummary(df(a), Seq("k"), "v"),
      Ops.aggSummary(df(b), Seq("k"), "v"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val direct = Ops.aggSummary(df(all), Seq("k"), "v")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(merged == direct)
    // n-way merge: shard into 4, same law
    val shards = all.grouped(75).toSeq.map(s => Ops.aggSummary(df(s), Seq("k"), "v"))
    assert(Ops.aggMerge(shards: _*)
      .as[(Long, Long, Long, Long, Long)].collect().toSet == direct)
  }

  test("deltaJoinMaintain: old join + delta == new join, multiset-exact") {
    // duplicate keys on BOTH sides pin the multiset algebra: key 1 has
    // 2 old + 1 delta rows in A and 1 old + 1 delta in B
    val oldA = Seq((1L, "a1"), (1L, "a2"), (2L, "a3")).toDF("k", "pa")
    val deltaA = Seq((1L, "a4"), (3L, "a5")).toDF("k", "pa")
    val oldB = Seq((1L, "b1"), (3L, "b2")).toDF("k", "pb")
    val deltaB = Seq((1L, "b3"), (2L, "b4")).toDF("k", "pb")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "pa", "pb").collect().map(_.toSeq).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    val maintained = bag(
      oldA.join(oldB, Seq("k"))
        .unionByName(Ops.deltaJoinMaintain(oldA, deltaA, oldB, deltaB, Seq("k"))))
    val recomputed = bag(
      oldA.unionByName(deltaA).join(oldB.unionByName(deltaB), Seq("k")))
    assert(maintained == recomputed)
    // empty deltas produce an empty delta join
    val empty = deltaA.limit(0)
    assert(Ops.deltaJoinMaintain(oldA, empty, oldB, deltaB.limit(0), Seq("k"))
      .count() == 0)
  }

  test("kAnonymityAudit counts combos; kAnonymize suppresses only sub-k rows") {
    // combo (1,1): 5 rows; (1,2): 2 rows; (2,1): 1 row
    val rows = (1L to 5L).map(i => (i, 1L, 1L)) ++
      Seq((6L, 1L, 2L), (7L, 1L, 2L), (8L, 2L, 1L))
    val df = rows.toDF("id", "qa", "qb").repartition(3)
    val audit = Ops.kAnonymityAudit(df, Seq("qa", "qb"), 3L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(audit == Map((1L, 1L) -> ((5L, true)), (1L, 2L) -> ((2L, false)),
      (2L, 1L) -> ((1L, false))))
    val anon = Ops.kAnonymize(df, Seq("qa", "qb"), 3L)
      .select(F.col("id"), F.col("qa"), F.col("qb"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val expect = (1L to 5L).map(i => (i, Some(1L), Some(1L))).toSet ++
      Set((6L, None, None), (7L, None, None), (8L, None, None))
    assert(anon == expect)
    // k=1: everything is anonymous, output identical to input
    assert(Ops.kAnonymize(df, Seq("qa", "qb"), 1L)
      .as[(Long, Long, Long)].collect().toSet == rows.toSet)
  }

  test("madOutliers: hand-computed medians, MAD, and flags per group") {
    val rows = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (5L, "a", 100L), // med 3, mad 1 → only 100 beyond 3·MAD
      (6L, "b", 1L), (7L, "b", 2L), (8L, "b", 3L), (9L, "b", 4L),
      // even group: med 2.5, mad 1.0 — no outliers at 3·MAD
      (10L, "c", 5L), (11L, "c", 5L), (12L, "c", 5L), (13L, "c", 9L))
      // degenerate MAD=0: any row off the median flags
    val r = Ops.madOutliers(rows.toDF("id", "g", "v").repartition(5),
        Seq("g"), "v")
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((3.0, 1.0, false)) && r(5L) == ((3.0, 1.0, true)))
    assert(r(6L) == ((2.5, 1.0, false)) && r(9L) == ((2.5, 1.0, false)))
    assert(r(10L) == ((5.0, 0.0, false)) && r(13L) == ((5.0, 0.0, true)))
  }

  test("madOutliers: mean/stddev would miss what the median/MAD rule catches") {
    // two huge values drag a z-score threshold but not the median
    val vals = (1L to 20L).map(v => (v, "g", (v % 5) + 10L)) ++
      Seq((21L, "g", 1000L), (22L, "g", 1001L))
    val flagged = Ops.madOutliers(vals.toDF("id", "g", "v"), Seq("g"), "v")
      .filter(F.col("is_outlier")).select("id").as[Long].collect().toSet
    assert(flagged == Set(21L, 22L))
  }

  test("transitionCounts: counts, ppm shares, and tie-broken ordering") {
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // user 1: A B A C ; user 2: A B  → A→B ×2, B→A ×1, A→C ×1
    val rows = Seq(
      (1L, "A", t(0), 1L), (1L, "B", t(1), 2L), (1L, "A", t(2), 3L),
      (1L, "C", t(3), 4L),
      (2L, "A", t(0), 5L), (2L, "B", t(1), 6L))
    val r = Ops.transitionCounts(rows.toDF("u", "e", "ts", "id")
        .repartition(3), "u", "e", "ts", Seq("id"))
      .as[(String, String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    assert(r == Map(("A", "B") -> ((2L, 666666L)), ("A", "C") -> ((1L, 333333L)),
      ("B", "A") -> ((1L, 1000000L))))
    // simultaneous events: the id tie-break fixes the lag order
    val tie = Seq((1L, "X", t(0), 1L), (1L, "Y", t(0), 2L), (1L, "Z", t(0), 3L))
    val rt = Ops.transitionCounts(tie.toDF("u", "e", "ts", "id"), "u", "e",
        "ts", Seq("id"))
      .as[(String, String, Long, Long)].collect().map(x => (x._1, x._2)).toSet
    assert(rt == Set(("X", "Y"), ("Y", "Z")))
  }

  test("bloomSemiJoin equals the plain semi-join (no false negatives, exact verify)") {
    val big = (1L to 500L).map(k => (k % 97, k)).toDF("k", "payload")
      .repartition(7)
    val small = Seq(3L, 11L, 42L, 96L, 1000L).toDF("k")
    val got = Ops.bloomSemiJoin(big, small, "k", numBits = 256, numHashes = 4)
      .as[(Long, Long)].collect().toSet
    val want = big.join(small, Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty && got.map(_._1) == Set(3L, 11L, 42L, 96L))
    // tiny filter (high fpr): STILL exact — the semi-join verifies
    assert(Ops.bloomSemiJoin(big, small, "k", numBits = 64, numHashes = 2)
      .as[(Long, Long)].collect().toSet == want)
  }

  test("rateLimit keeps the first n per (key, window) by (ts, tie)") {
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val rows = Seq(
      (1L, t(0), 1L), (1L, t(1), 2L), (1L, t(2), 3L), (1L, t(3), 4L),
      (1L, t(3600), 5L), // next window: counter resets
      (2L, t(0), 6L),
      (3L, t(10), 7L), (3L, t(10), 8L), (3L, t(10), 9L)) // ties → id order
    val kept = Ops.rateLimit(rows.toDF("k", "ts", "id").repartition(4),
        Seq("k"), "ts", "id", 3600L, 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L, 6L, 7L, 8L))
  }

  test("winsorize clamps into exact per-group quantile bounds") {
    val rows = (1L to 100L).map(v => (v, "g", v)) // values 1..100
    val r = Ops.winsorize(rows.toDF("id", "g", "v"), Seq("g"), "v", 0.05, 0.95)
      .select("id", "w_lo", "w_hi", "v_w")
      .as[(Long, Double, Double, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    // exact percentiles of 1..100: p5 = 5.95, p95 = 95.05
    assert(r(1L) == ((5.95, 95.05, 5.95)))
    assert(r(50L)._3 == 50.0)
    assert(r(100L)._3 == 95.05)
    // global mode (keys = Nil) agrees on a single group
    val g = Ops.winsorize(rows.toDF("id", "g", "v"), Nil, "v", 0.05, 0.95)
      .select("id", "v_w").as[(Long, Double)].collect().toMap
    assert(g(100L) == 95.05 && g(1L) == 5.95)
  }

  test("groupLinearFit: exact rational slope on hand-built lines") {
    // y = 3x + 7 exactly: num/den = slope 3, ppm 3e6
    val exact = (0L to 10L).map(x => ("a", x, 3 * x + 7))
    // constant x → den 0 → NULL slope
    val degen = Seq(("b", 5L, 1L), ("b", 5L, 9L))
    val r = Ops.groupLinearFit((exact ++ degen).toDF("k", "x", "y")
        .repartition(3), Seq("k"), "x", "y")
      .select("k", "n", "num", "den", "slope_ppm")
      .collect().map(row => row.getString(0) -> ((row.getLong(1),
        row.getLong(2), row.getLong(3),
        if (row.isNullAt(4)) None else Some(row.getLong(4))))).toMap
    assert(r("a")._4 == Some(3000000L))
    assert(r("a")._2 == 3L * r("a")._3) // num = 3·den exactly
    assert(r("b") == ((2L, 0L, 0L, None)))
    // noisy-but-known: two points (0,0),(2,1) → slope 0.5 → 500000
    val two = Ops.groupLinearFit(Seq(("c", 0L, 0L), ("c", 2L, 1L))
        .toDF("k", "x", "y"), Seq("k"), "x", "y")
      .select("slope_ppm").as[Long].head()
    assert(two == 500000L)
  }

  test("cusumAlarm matches the sequential clamped recursion on random streams") {
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val rows = for (k <- 0L until 6L; i <- 0L until 40L) yield
      (k, t(i), k * 100 + i, ((i * 31 + k * 17) % 21) - 7) // values in [-7, 13]
    val target = 2L
    val got = Ops.cusumAlarm(rows.toDF("k", "ts", "id", "v").repartition(5),
        Seq("k"), "ts", "id", "v", target, threshold = 15L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    for (k <- 0L until 6L) {
      var s = 0L; var mx = 0L; var alarmTs: Option[Long] = None
      rows.filter(_._1 == k).sortBy(r => (r._2.getTime, r._3)).foreach { r =>
        s = math.max(0L, s + r._4 - target); mx = math.max(mx, s)
        if (s >= 15L && alarmTs.isEmpty) alarmTs = Some(r._2.getTime * 1000)
      }
      assert(got(k) == ((mx, mx >= 15L, alarmTs)), s"key $k")
    }
  }

  test("seasonalBaseline: per-(key, slot) exact mean and residual") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val rows = Seq(
      (1L, "a", t(9), 10L), (2L, "a", t(9), 20L),  // a@9: baseline 15
      (3L, "a", t(10), 7L),                         // a@10: baseline 7
      (4L, "b", t(9), 100L), (5L, "b", t(9), 101L)) // b@9: 100 (div floor)
    val r = Ops.seasonalBaseline(rows.toDF("id", "k", "ts", "v")
        .repartition(3), Seq("k"), "v", F.hour(F.col("ts")), "hod")
      .select("id", "baseline", "residual")
      .as[(Long, Long, Long)].collect().toMap2
    assert(r(1L) == ((15L, -5L)) && r(2L) == ((15L, 5L)))
    assert(r(3L) == ((7L, 0L)))
    assert(r(4L) == ((100L, 0L)) && r(5L) == ((100L, 1L)))
  }

  test("lDiversityAudit: homogeneous group fails even when k-large") {
    val df = Seq(("x", "s1"), ("x", "s1"), ("x", "s1"),
      ("y", "a"), ("y", "b")).toDF("qa", "sens")
    val r = Ops.lDiversityAudit(df, Seq("qa"), "sens", 2L)
      .as[(String, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("x") == ((3L, 1L, false))) // big but constant → homogeneity attack
    assert(r("y") == ((2L, 2L, true)))
    intercept[IllegalArgumentException](
      Ops.lDiversityAudit(df, Nil, "sens", 2L))
    intercept[IllegalArgumentException](
      Ops.lDiversityAudit(df, Seq("qa"), "sens", 0L))
  }

  test("targetEncodeLoo: peers-only mean in exact ppm, singleton NULL") {
    val df = Seq((1L, "c1", 10L), (2L, "c1", 20L), (3L, "c1", 30L),
      (4L, "c2", 99L)).toDF("id", "cat", "y")
    val r = Ops.targetEncodeLoo(df, "cat", "y")
      .select("id", "enc_ppm").as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(25000000L)) // (20+30)/2
    assert(r(2L).contains(20000000L))
    assert(r(3L).contains(15000000L))
    assert(r(4L).isEmpty) // no peers: own target would be leakage
  }

  test("proportionTest: hand-computed z², equal rates, degenerate NULL") {
    val rows =
      (1 to 100).map(i => ("control", if (i <= 10) 1L else 0L)) ++
      (1 to 100).map(i => ("t1", if (i <= 30) 1L else 0L)) ++
      (1 to 50).map(i => ("t2", if (i <= 5) 1L else 0L))
    val r = Ops.proportionTest(rows.toDF("variant", "converted").repartition(4),
        "variant", "converted", "control")
      .select("variant", "z2_ppm", "significant")
      .as[(String, Option[Long], Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // t1: diff=2000, z² = 4e6·200/(100·100·40·160) = 12.5 exactly
    assert(r("t1") == ((Some(12500000L), true)))
    // t2: same 10% rate as control → z² = 0
    assert(r("t2") == ((Some(0L), false)))
    // all-zero conversions: pooled p = 0 → zero variance → NULL verdict
    val z = Seq(("control", 0L), ("control", 0L), ("tx", 0L))
      .toDF("variant", "converted")
    val rz = Ops.proportionTest(z, "variant", "converted", "control")
      .select("variant", "z2_ppm", "significant")
      .as[(String, Option[Long], Boolean)].collect()
    assert(rz.toSeq == Seq(("tx", None, false)))
  }

  test("autocorrStats: perfect/anti/constant series, hand stats, tie order") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    def run(vals: Seq[Long], maxLag: Int) =
      Ops.autocorrStats(
        vals.zipWithIndex.map { case (v, i) => ("k", ts(i), i.toLong, v) }
          .toDF("key", "ts", "id", "v").repartition(3),
        Seq("key"), "ts", "v", maxLag, Seq("id"))
        .select("lag", "n", "num", "denx", "deny", "r2_ppm")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    // x_t = t: perfect positive correlation at every lag
    val lin = run((1L to 10L), 2)
    assert(lin(1L)._5.contains(1000000L) && lin(2L)._5.contains(1000000L))
    // alternating 0,1: lag-1 anti-correlated exactly
    val alt = run(Seq(0L, 1L, 0L, 1L, 0L, 1L), 1)
    assert(alt(1L) == ((5L, -6L, 6L, 6L, Some(-1000000L))))
    // constant: zero variance → NULL
    assert(run(Seq(7L, 7L, 7L, 7L), 1)(1L)._5.isEmpty)
    // hand stats on (1,2,4): n=2, num=2, denx=4, deny=1, r²=1
    assert(run(Seq(1L, 2L, 4L), 1)(1L) == ((2L, 2L, 4L, 1L, Some(1000000L))))
    // lag past the series produces no group at all
    assert(!run(Seq(1L, 2L), 2).contains(2L))
  }

  test("mergeIntervals: overlap/touch/gap semantics, per-key isolation") {
    val df = Seq(
      ("a", 1L, 5L), ("a", 4L, 8L),   // overlap → one span [1,8]
      ("a", 9L, 10L),                 // gap 1 from 8 → separate at maxGap=0
      ("a", 20L, 25L), ("a", 21L, 22L), // contained
      ("b", 1L, 2L))                  // other key untouched
      .toDF("k", "s", "e")
    def run(gap: Long) = Ops.mergeIntervals(df.repartition(3), Seq("k"),
        "s", "e", gap)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(run(0L) == Set(("a", 1L, 8L, 2L), ("a", 9L, 10L, 1L),
      ("a", 20L, 25L, 2L), ("b", 1L, 2L, 1L)))
    // gap tolerance 1 fuses [1,8] and [9,10]
    assert(run(1L) == Set(("a", 1L, 10L, 3L), ("a", 20L, 25L, 2L),
      ("b", 1L, 2L, 1L)))
    // an early long interval swallowing later ones (running MAX end, not
    // lag(end)): [1,100] then [2,3], [50,60], [90,110]
    val swallow = Seq(("x", 1L, 100L), ("x", 2L, 3L), ("x", 50L, 60L),
      ("x", 90L, 110L)).toDF("k", "s", "e")
    assert(Ops.mergeIntervals(swallow, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
      == Set(("x", 1L, 110L, 4L)))
  }

  test("benfordAudit: exact shares vs the hardcoded ppm table") {
    // 30 ones, 18 twos, 12 threes: obs 500000/300000/200000 ppm
    val vals = Seq.fill(30)(1L) ++ Seq.fill(18)(25L) ++ Seq.fill(12)(300L) ++
      Seq(0L, -5L) // excluded: no leading digit
    val r = Quality.benfordAudit(vals.toDF("v").repartition(4), "v")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((30L, 500000L, 301030L, 198970L)))
    assert(r(2L) == ((18L, 300000L, 176091L, 123909L)))
    assert(r(3L) == ((12L, 200000L, 124939L, 75061L)))
    assert(r.keySet == Set(1L, 2L, 3L))
  }

  test("sequenceCounts: sliding trigram counts, support threshold, order") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    val rows = Seq(
      (1L, "a", ts(1), 1L), (1L, "b", ts(2), 2L), (1L, "c", ts(3), 3L),
      (1L, "a", ts(4), 4L), (1L, "b", ts(5), 5L), (1L, "c", ts(6), 6L),
      (2L, "a", ts(1), 7L), (2L, "b", ts(2), 8L)) // too short for n=3
      .toDF("u", "t", "ts", "id")
    val r = Ops.sequenceCounts(rows.repartition(3), "u", "t", "ts",
        Seq("id"), n = 3).as[(String, Long)].collect().toMap
    // user 1 trigrams: abc, bca, cab, abc → abc:2, others 1
    assert(r == Map("a > b > c" -> 2L, "b > c > a" -> 1L,
      "c > a > b" -> 1L))
    val top = Ops.sequenceCounts(rows, "u", "t", "ts", Seq("id"), n = 3,
      minCount = 2L).as[(String, Long)].collect().toMap
    assert(top == Map("a > b > c" -> 2L))
    // n=2 equals transitionCounts' pair counts
    val pairs = Ops.sequenceCounts(rows, "u", "t", "ts", Seq("id"), n = 2,
      sep = ">").as[(String, Long)].collect().toMap
    val tc = Ops.transitionCounts(rows, "u", "t", "ts", Seq("id"))
      .select(F.concat_ws(">", F.col("from_type"), F.col("to_type")),
        F.col("cnt")).as[(String, Long)].collect().toMap
    assert(pairs == tc)
  }

  test("chiSquareCells: independence zero, perfect association, hand 2×2") {
    def run(counts: Seq[((String, String), Int)]) =
      Ops.chiSquareCells(
        counts.flatMap { case ((a, b), c) => Seq.fill(c)((a, b)) }
          .toDF("x", "y").repartition(3), "x", "y")
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> ((t._3, t._6))).toMap
    // exactly independent: every term 0
    val ind = run(Seq(("x", "p") -> 2, ("x", "q") -> 2,
      ("y", "p") -> 1, ("y", "q") -> 1))
    assert(ind.values.map(_._2).toSet == Set(0L))
    // perfect 2×2 association: χ² = N, zero cells present and counted
    val diag = run(Seq(("a", "p") -> 2, ("b", "q") -> 2))
    assert(diag(("a", "q")) == ((0L, 1000000L))) // structural zero: term=e
    assert(diag.values.map(_._2).sum == 4000000L)
    // hand-computed [[10,20],[30,40]]: 4/12, 4/18, 4/28, 4/42
    val h = run(Seq(("a", "p") -> 10, ("a", "q") -> 20,
      ("b", "p") -> 30, ("b", "q") -> 40))
    assert(h(("a", "p"))._2 == 333333L && h(("a", "q"))._2 == 222222L)
    assert(h(("b", "p"))._2 == 142857L && h(("b", "q"))._2 == 95238L)
  }

  test("compactionBins: cumulative next-fit bins, deterministic, contiguous") {
    // sizes 60,60,60 at target 100: cums 60,120,180 → starts 0,60,120 →
    // bins 0,0,1 (overshoot ≤ one file)
    val df = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("id", "sz")
    val r = Ops.compactionBins(df.repartition(3), "sz", 100L, F.col("id"))
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    // contiguity + partitioning independence on a bigger ladder
    val big = (1L to 200L).map(i => (i, (i * 37) % 90 + 10))
    def bins(parts: Int) = Ops.compactionBins(
        big.toDF("id", "sz").repartition(parts), "sz", 500L, F.col("id"))
      .select("id", "bin").as[(Long, Long)].collect().sorted.toSeq
    val b1 = bins(1)
    assert(b1 == bins(7))
    assert(b1.map(_._2) == b1.map(_._2).sorted) // contiguous runs in order
    intercept[IllegalArgumentException](
      Ops.compactionBins(df, "sz", 0L, F.col("id")))
  }

  test("forwardFill: LOCF per key, leading nulls stay, keys isolated") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    val df = Seq(
      ("a", ts(1), 1L, None), ("a", ts(2), 2L, Some(10L)),
      ("a", ts(3), 3L, None), ("a", ts(4), 4L, None),
      ("a", ts(5), 5L, Some(7L)), ("a", ts(6), 6L, None),
      ("b", ts(1), 7L, None)) // other key: no bleed from a
      .toDF("k", "ts", "id", "v")
    val r = Ops.forwardFill(df.repartition(3), Seq("k"), "ts", "v", Seq("id"))
      .select("id", "v_filled").as[(Long, Option[Long])].collect().toMap
    assert(r(1L).isEmpty) // leading null: nothing to carry
    assert(r(2L).contains(10L) && r(3L).contains(10L) && r(4L).contains(10L))
    assert(r(5L).contains(7L) && r(6L).contains(7L))
    assert(r(7L).isEmpty)
  }

  test("scd2Lookup: per-row point-in-time attributes, delete closes, left") {
    val feed = Seq(
      (1L, 10L, "a", "upsert"), (1L, 20L, "b", "upsert"),
      (1L, 30L, "x", "delete"), (2L, 5L, "z", "upsert"))
      .toDF("k", "version", "attr", "op")
    val h = Ops.scdType2(feed, Seq("k"), "version")
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 15L), (1L, 20L), (1L, 25L),
      (1L, 35L), (2L, 99L), (3L, 1L)).toDF("k", "at")
    val r = Ops.scd2Lookup(facts.repartition(3), h, Seq("k"), "at")
      .select("k", "at", "attr").as[(Long, Long, Option[String])]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 5L)).isEmpty)          // before first change
    assert(r((1L, 10L)).contains("a") && r((1L, 15L)).contains("a"))
    assert(r((1L, 20L)).contains("b") && r((1L, 25L)).contains("b"))
    assert(r((1L, 35L)).isEmpty)         // closed by the delete at 30
    assert(r((2L, 99L)).contains("z"))   // open current row
    assert(r((3L, 1L)).isEmpty)          // key with no history at all
    assert(r.size == 8)                  // exactly one row per fact
  }

  test("minMaxScale: exact ppm per group, constant group NULL") {
    val df = Seq(("g", 10L), ("g", 15L), ("g", 20L),
      ("c", 7L), ("c", 7L)).toDF("k", "v")
    val r = Ops.minMaxScale(df.repartition(3), Seq("k"), "v")
      .select("k", "v", "scaled_ppm")
      .as[(String, Long, Option[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toSet
    assert(r.contains(("g", 10L) -> Some(0L)))
    assert(r.contains(("g", 15L) -> Some(500000L)))
    assert(r.contains(("g", 20L) -> Some(1000000L)))
    assert(r.contains(("c", 7L) -> None))
  }

  test("randomizedResponse: hash-coin flips exactly, debias formula, clamp") {
    val df = (1L to 40L).map(i => (i, i % 2 == 0)).toDF("id", "truth")
    val rr = Ops.randomizedResponse(df.repartition(3), "id", "truth", 1L, 4L)
    // reported ≡ truth XOR (hash % 4 < 1), checked row-wise via the
    // same column expression
    val bad = rr.withColumn("_flip",
        PortableHash.long(7L, F.col("id")) % 4L < 1L)
      .filter(F.col("reported") =!= (F.col("truth") =!= F.col("_flip")))
      .count()
    assert(bad == 0L)
    assert(rr.filter(F.col("reported") =!= F.col("truth")).count() > 0L)
    // hand debias: n=10 reports, 4 true, p=1/4 → (16−10)e6/20 = 300000
    val hand = ((1 to 4).map(_ => true) ++ (1 to 6).map(_ => false))
      .toDF("reported")
    val est = Ops.rrDebias(hand, "reported", 1L, 4L)
      .select("est_true_ppm").as[Long].collect().head
    assert(est == 300000L)
    val clamped = Ops.rrDebias(Seq(false, false).toDF("reported"),
      "reported", 1L, 4L).select("est_true_ppm").as[Long].collect().head
    assert(clamped == 0L)
    intercept[IllegalArgumentException](
      Ops.randomizedResponse(df, "id", "truth", 2L, 4L))
  }

  test("cohensKappa: perfect, hand 2×2, systematic disagreement, degenerate") {
    def run(rows: Seq[(String, String)]) =
      Ops.cohensKappa(rows.toDF("a", "b").repartition(3), "a", "b")
        .select("n", "agree", "pe_scaled", "kappa_ppm")
        .as[(Long, Long, Long, Option[Long])].collect().head
    val perfect = run(Seq.fill(5)(("x", "x")) ++ Seq.fill(3)(("y", "y")))
    assert(perfect._4.contains(1000000L))
    // 2×2: agree 35/50, pe = (25·30 + 25·20)/50² → κ = 500/1250 = 0.4
    val hand = run(Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")))
    assert(hand == ((50L, 35L, 1250L, Some(400000L))))
    assert(run(Seq(("y", "n"), ("n", "y")))._4.contains(-1000000L))
    assert(run(Seq.fill(3)(("x", "x")))._4.isEmpty) // both constant
  }

  test("goldenRecord: latest non-null per attribute, all-null stays null") {
    val df = Seq(
      (1L, 1L, Some(1L), None: Option[String], None: Option[Long]),
      (1L, 2L, None, Some("x"), None),
      (1L, 3L, Some(7L), None, None),
      (2L, 9L, Some(5L), Some("z"), Some(4L)))
      .toDF("k", "version", "a", "b", "c")
    val r = Ops.goldenRecord(df.repartition(3), Seq("k"), "version",
        Seq("a", "b", "c"))
      .as[(Long, Option[Long], Option[String], Option[Long], Long)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((Some(7L), Some("x"), None, 3L)))
    assert(r(2L) == ((Some(5L), Some("z"), Some(4L), 1L)))
    intercept[IllegalArgumentException](
      Ops.goldenRecord(df, Seq("k"), "version", Nil))
  }

  test("frequentTriples: C(n,3) per basket, support filter, jumbo cap") {
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L),     // dup collapses
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L),     // C(4,3)=4 triples
      (3L, 1L), (3L, 2L))                          // too small
      .toDF("bk", "it")
    val all = Ops.frequentTriples(baskets.repartition(3), "bk", "it",
        minSupport = 1L)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    assert(all((1L, 2L, 3L)) == 2L) // in baskets 1 and 2
    assert(all((1L, 2L, 4L)) == 1L && all((2L, 3L, 4L)) == 1L)
    assert(all.size == 4)
    val sup = Ops.frequentTriples(baskets, "bk", "it", minSupport = 2L)
      .as[(Long, Long, Long, Long)].collect()
    assert(sup.toSeq == Seq((1L, 2L, 3L, 2L)))
    // cap: basket 2 dropped at maxBasket=3 → (1,2,3) support falls to 1
    val capped = Ops.frequentTriples(baskets, "bk", "it", 1L, maxBasket = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(capped == Seq((1L, 2L, 3L, 1L)))
  }

  test("interArrivalStats: hand deltas, exact mean, rounded percentiles") {
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // key a deltas: 10s, 20s; key b: 40s → all = [1e7, 2e7, 4e7] µs
    val df = Seq(("a", t(0), 1L), ("a", t(10), 2L), ("a", t(30), 3L),
      ("b", t(100), 4L), ("b", t(140), 5L)).toDF("k", "ts", "id")
    val r = Ops.interArrivalStats(df.repartition(3), Seq("k"), "ts",
        Seq("id"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == (70000000L / 3L))
    assert(r._3 == 2.0e7) // median
    assert(r._4 == 3.6e7) // p90: 2e7 + 0.8·2e7
  }

  test("skewReport: exact shares, top-10 via the bounded heap") {
    // key 0: 50 rows, keys 1..20: 1 row each → top1 50/70, top10 59/70
    val rows = Seq.fill(50)(0L) ++ (1L to 20L)
    val r = Ops.skewReport(rows.toDF("k").repartition(4), "k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((70L, 21L, 50L, 59L, 714285L, 842857L)))
  }

  test("skewReport: non-numeric keys group correctly (no BIGINT-cast collapse)") {
    // string keys: a BIGINT cast turns every key into NULL = 1 group and a
    // false top1_share_ppm of 10⁶ (ADVICE r10); xxhash64 grouping keeps the
    // identical share algebra as the long-key case
    val rows = Seq.fill(50)("hot") ++ (1 to 20).map(i => s"key_$i")
    val r = Ops.skewReport(rows.toDF("k").repartition(4), "k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((70L, 21L, 50L, 59L, 714285L, 842857L)))
  }

  test("rollingDistinct: trailing range window, ties are peers") {
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val df = Seq(("u", t(0), "a"), ("u", t(5), "b"), ("u", t(5), "a"),
      ("u", t(30), "c"), ("v", t(0), "z")).toDF("k", "ts", "v")
    val r = Ops.rollingDistinct(df.repartition(3), Seq("k"), "ts", "v", 10L)
      .select("k", "ts", "rolling_distinct")
      .as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(x => (x._1, x._2.getTime)).view
      .mapValues(_.map(_._3).toSet).toMap
    assert(r(("u", t(0).getTime)) == Set(1L))  // trailing: t=5 not visible
    assert(r(("u", t(5).getTime)) == Set(2L))  // peers: both see {a,b}
    assert(r(("u", t(30).getTime)) == Set(1L)) // window slid past
    assert(r(("v", t(0).getTime)) == Set(1L))
  }

  test("detectPeaks: margin rule, endpoints never peak, keys isolated") {
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    val df = Seq(("a", t(1), 1L, 5L), ("a", t(2), 2L, 9L),
      ("a", t(3), 3L, 4L), ("a", t(4), 4L, 6L), ("a", t(5), 5L, 6L),
      ("b", t(1), 6L, 100L)).toDF("k", "ts", "id", "v")
    def peaks(m: Long) = Ops.detectPeaks(df.repartition(3), Seq("k"), "ts",
        "v", m, Seq("id"))
      .filter(F.col("is_peak")).select("id").as[Long].collect().toSet
    assert(peaks(1L) == Set(2L))        // 9 over (5, 4)
    assert(peaks(4L) == Set(2L))        // margin 4: 9−5 ✓
    assert(peaks(5L) == Set.empty[Long]) // 9−5 < 5
    // plateau 6,6 at the end: id4 fails (next=6 needs +m); endpoint id5 never
  }

  test("imputeMode: group mode fills nulls, ties → smallest, all-null stays") {
    val df = Seq(
      ("g", Some("b")), ("g", Some("b")), ("g", Some("a")), ("g", None),
      ("t", Some("x")), ("t", Some("y")), ("t", None), // tie → 'x'
      ("z", None))                                      // no evidence
      .toDF("k", "v")
    val r = Ops.imputeMode(df.repartition(3), Seq("k"), "v")
      .select("k", "v", "v_imputed")
      .as[(String, Option[String], Option[String])].collect()
    assert(r.filter(x => x._1 == "g" && x._2.isEmpty)
      .forall(_._3.contains("b")))
    assert(r.filter(x => x._1 == "t" && x._2.isEmpty)
      .forall(_._3.contains("x")))
    assert(r.filter(_._1 == "z").forall(_._3.isEmpty))
    // non-null cells untouched
    assert(r.filter(_._2.isDefined).forall(x => x._2 == x._3))
  }

  test("rangeOverlapAudit: disjoint 1s, nested counts, duplicates") {
    val files = Seq((1L, 0L, 9L), (2L, 10L, 19L), (3L, 5L, 14L),
      (4L, 100L, 100L)).toDF("f", "lo", "hi")
    val r = Ops.rangeOverlapAudit(files.repartition(3), "lo", "hi")
      .select("f", "overlaps").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("giniConcentration: even zero, hand 2-key, layout/tie stable") {
    def gini(rows: Seq[Long], parts: Int = 3) =
      Ops.giniConcentration(rows.toDF("k").repartition(parts), "k")
        .as[(Long, Long, Long)].collect().head
    // 4 keys × 5 rows: perfectly even
    assert(gini((1L to 4L).flatMap(k => Seq.fill(5)(k))) == ((4L, 20L, 0L)))
    // (1, 99): G = 98/200 = 0.49
    assert(gini(Seq(1L) ++ Seq.fill(99)(2L)) == ((2L, 100L, 490000L)))
    // many equal-count ties: partitioning-independent
    val ties = (1L to 30L).flatMap(k => Seq.fill(3)(k)) ++ Seq.fill(60)(99L)
    assert(gini(ties, parts = 1) == gini(ties, parts = 11))
    // value-weighted mass ≡ count mass when each row carries weight 1,
    // and reproduces the (1,99) hand case as one row per key
    val w = Seq((1L, 1L), (2L, 99L)).toDF("k", "v")
    assert(Ops.giniConcentration(w, "k", Some("v"))
      .as[(Long, Long, Long)].collect().head == ((2L, 100L, 490000L)))
  }

  test("giniConcentration: DECIMAL ppm path survives n·S·10⁶ > 2⁶³") {
    // masses 1e15/2e15/3e15: S = 6e15, n·S·10⁶ = 1.8e22 ≫ 2⁶³ ≈ 9.2e18 —
    // the pre-r11 BIGINT ppm multiply silently overflowed here.
    // G = (2·14e15 − 4·6e15) / (3·6e15) = 4/18 → 222222 ppm
    val w = Seq((1L, 1000000000000000L), (2L, 2000000000000000L),
      (3L, 3000000000000000L)).toDF("k", "v")
    assert(Ops.giniConcentration(w, "k", Some("v"))
      .as[(Long, Long, Long)].collect().head
      == ((3L, 6000000000000000L, 222222L)))
  }

  private implicit class Map2[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(x => x._1 -> ((x._2, x._3))).toMap
  }
}
