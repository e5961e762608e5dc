package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamingOps._

  test("streamingSequenceGenerate: 2-batch stream and batch mode equal SequenceGenerator") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 10L, 3L), (1L, 20L, 7L), (1L, 30L, 10L), (1L, 40L, 2L),
      (2L, 10L, 5L), (2L, 25L, 8L),
      (3L, 5L, 4L)) // single event — no case emitted
    val df = rows.toDF("user_id", "ts_us", "item_id")
    val batchTwin = graft.preprocessing.SequenceGenerator.transform(df,
        groupBy = Seq("user_id"), orderBy = Seq("ts_us", "item_id"),
        transformColumns = Seq("item_id"), lenWindow = 2)
      .select(F.col("user_id"), F.col("label_item_id"),
        F.col("item_id_list"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toList)).toSet
    val batchMode = streamingSequenceGenerate(df.as[SeqEvent], lenWindow = 2)
      .collect().map(c => (c.user_id, c.label_item_id, c.prefix.toList)).toSet
    assert(batchMode == batchTwin)
    assert(batchTwin.contains((1L, 2L, List(7L, 10L)))) // window bound kicks in
    // real 2-batch stream split mid-history, in-order feed per user
    val input = MemoryStream[(Long, Long, Long)]
    val q = streamingSequenceGenerate(
        input.toDF().toDF("user_id", "ts_us", "item_id").as[SeqEvent],
        lenWindow = 2)
      .writeStream.format("memory").queryName("sseqgen")
      .outputMode("append").start()
    val (b1, b2) = rows.partition(_._2 <= 20L)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("sseqgen").as[SeqCase]
      .collect().map(c => (c.user_id, c.label_item_id, c.prefix.toList)).toSet
    q.stop()
    assert(streamed == batchTwin, s"streamed=$streamed batch=$batchTwin")
  }

  test("sessionWindows on batch matches gap semantics") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 12:00:00", 3.0), (2L, "2024-01-01 09:00:00", 4.0),
    ).toDF("user_id", "ts", "value").withColumn("ts", F.to_timestamp($"ts"))
    val out = sessionWindows(df, gapSeconds = 3600)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("streamingSessionize runs as a real stream to a memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("user_id", "ts", "value")
    val q = streamingSessionize(stream, gapSeconds = 3600, watermark = "2 hours")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((1L, ts("2024-01-01 10:00:00"), 1.0), (1L, ts("2024-01-01 10:30:00"), 2.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first session
    input.addData((1L, ts("2024-01-02 23:00:00"), 5.0))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-04 12:00:00"), 6.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    q.stop()
    assert(rows.contains((1L, 2L, 3.0))) // first session emitted on close
  }

  test("windowedCounts: stream with watermark equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click"), (ts("2024-01-01 10:55:00"), "click"),
      (ts("2024-01-01 10:10:00"), "view"),
      (ts("2024-01-01 11:05:00"), "click"),
      (ts("2024-01-01 15:00:00"), "view"), // watermark pusher
    )
    val batch = windowedCounts(
      events.toDF("ts", "event_type"), windowSeconds = 3600)
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = windowedCounts(
      input.toDF().toDF("ts", "event_type").withWatermark("ts", "1 hour"),
      windowSeconds = 3600)
      .writeStream.format("memory").queryName("wcounts")
      .outputMode("append").start()
    input.addData(events.take(4): _*); q.processAllAvailable()
    input.addData(events.drop(4): _*); q.processAllAvailable()
    input.addData((ts("2024-01-02 10:00:00"), "view")); q.processAllAvailable()
    val streamed = spark.table("wcounts")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    q.stop()
    // every window closed by the watermark must match the batch result
    val closed = batch.filter(_._1.before(ts("2024-01-01 15:00:00")))
    assert(closed.subsetOf(streamed), s"closed=$closed streamed=$streamed")
    assert(streamed.subsetOf(batch))
  }

  test("windowedTopK crops per window; stream+crop equals the batch twin") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click"), (ts("2024-01-01 10:06:00"), "click"),
      (ts("2024-01-01 10:10:00"), "view"), (ts("2024-01-01 10:11:00"), "view"),
      (ts("2024-01-01 10:20:00"), "buy"),
      (ts("2024-01-01 11:05:00"), "buy"),
    )
    val batch = windowedTopK(events.toDF("ts", "event_type"),
      windowSeconds = 3600, k = 2)
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // hour 10: click=2, view=2, buy=1 → top-2 = click, view (tie → key asc)
    assert(batch == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L),
      (ts("2024-01-01 10:00:00"), "view", 2L),
      (ts("2024-01-01 11:00:00"), "buy", 1L)))

    // the streaming shape: watermarked windowedCounts emits closed windows,
    // the crop runs on the sink (per-micro-batch/downstream) — must agree
    // with the batch twin on every closed window
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = windowedCounts(
      input.toDF().toDF("ts", "event_type").withWatermark("ts", "1 hour"),
      windowSeconds = 3600)
      .writeStream.format("memory").queryName("wtopk_counts")
      .outputMode("append").start()
    input.addData(events: _*); q.processAllAvailable()
    input.addData((ts("2024-01-02 10:00:00"), "view")); q.processAllAvailable()
    val cropped = graft.core.Ops.topK(spark.table("wtopk_counts"),
      Seq("window_start"), Seq($"n".desc, $"event_type".asc), 2)
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    q.stop()
    val closed = batch.filter(_._1.before(ts("2024-01-01 11:00:00")))
    assert(closed.subsetOf(cropped), s"closed=$closed cropped=$cropped")
  }

  test("streamingWindowedTopK: one query, two chained stateful aggregations") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), 7L), (ts("2024-01-01 10:06:00"), 7L),
      (ts("2024-01-01 10:10:00"), 3L), (ts("2024-01-01 10:11:00"), 3L),
      (ts("2024-01-01 10:20:00"), 9L),
      (ts("2024-01-01 11:40:00"), 9L),
    )
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = streamingWindowedTopK(
      input.toDF().toDF("ts", "item_id"), windowSeconds = 3600, k = 2)
      .writeStream.format("memory").queryName("stream_topk")
      .outputMode("append").start()
    input.addData(events: _*); q.processAllAvailable()
    // push the watermark past hour 10 so its window closes END-TO-END
    // (both stateful stages must emit)
    input.addData((ts("2024-01-02 12:00:00"), 1L)); q.processAllAvailable()
    val got = spark.table("stream_topk")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    q.stop()
    // hour 10: item 3 and 7 tie at 2 (key asc wins), 9 dropped by k=2
    val hour10 = got.filter(_._1 == ts("2024-01-01 10:00:00"))
    assert(hour10 == Set(
      (ts("2024-01-01 10:00:00"), 3L, 2L),
      (ts("2024-01-01 10:00:00"), 7L, 2L)), s"got=$got")
    // batch twin agrees on the closed window
    val batch = windowedTopK(events.toDF("ts", "item_id"),
      windowSeconds = 3600, k = 2, keyCol = "item_id")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(hour10.subsetOf(batch))
  }

  test("windowedTopK dispatches integral keys to the bounded-heap crop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), 7L), (ts("2024-01-01 10:06:00"), 7L),
      (ts("2024-01-01 10:10:00"), 3L), (ts("2024-01-01 10:11:00"), 3L),
      (ts("2024-01-01 10:20:00"), 9L),
    ).toDF("ts", "item_id")
    val df = windowedTopK(events, windowSeconds = 3600, k = 2, keyCol = "item_id")
    val rows = df.as[(java.sql.Timestamp, Long, Long)].collect().toSet
    // counts: 7→2, 3→2, 9→1; tie at 2 breaks on key asc → items 3, 7
    assert(rows == Set(
      (ts("2024-01-01 10:00:00"), 3L, 2L),
      (ts("2024-01-01 10:00:00"), 7L, 2L)))
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("ObjectHashAggregate"),
      "integral-key windowed top-k should take the bounded-heap path")
  }

  test("sessionizeWithState: closed sessions match the native session_window") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      UserEvent(1L, ts("2024-01-01 10:30:00"), 2.0),   // same session (< 1h gap)
      UserEvent(1L, ts("2024-01-01 12:30:00"), 3.0),   // closes session 1
      UserEvent(2L, ts("2024-01-01 09:00:00"), 4.0),
      UserEvent(2L, ts("2024-01-01 11:00:00"), 5.0),   // closes user 2's first
    )
    val input = MemoryStream[UserEvent]
    val q = sessionizeWithState(input.toDS(), gapSeconds = 3600)
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    input.addData(events.take(2): _*); q.processAllAvailable()
    input.addData(events.drop(2): _*); q.processAllAvailable()
    val closed = spark.table("state_sessions")
      .as[SessionOut].collect().toSet
    q.stop()
    // sessions CLOSED by a later event; the final session per user stays
    // open in state (append-mode semantics, same as session_window)
    assert(closed == Set(
      SessionOut(1L, ts("2024-01-01 10:00:00").getTime, 2L, 3.0),
      SessionOut(2L, ts("2024-01-01 09:00:00").getTime, 1L, 4.0)))
    // the native-operator batch twin agrees on these sessions
    val batch = sessionWindows(
      events.map(e => (e.user_id, e.ts, e.value)).toDF("user_id", "ts", "value"),
      gapSeconds = 3600)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => SessionOut(r._1, r._2, r._3, r._4)).toSet
    assert(closed.subsetOf(batch))
  }

  test("sessionizeWithState rounds HALF_UP like the batch twin's round(sum, 2)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // session sum = 2.125, exactly representable: HALF_UP -> 2.13
    // (math.rint's half-even gave 2.12, diverging from F.round)
    val input = MemoryStream[UserEvent]
    val q = sessionizeWithState(input.toDS(), gapSeconds = 3600)
      .writeStream.format("memory").queryName("halfup_sessions")
      .outputMode("append").start()
    input.addData(
      UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      UserEvent(1L, ts("2024-01-01 10:10:00"), 1.125),
      UserEvent(1L, ts("2024-01-01 12:00:00"), 9.0)) // closes the session
    q.processAllAvailable()
    val closed = spark.table("halfup_sessions").as[SessionOut].collect()
    q.stop()
    assert(closed.toSeq == Seq(
      SessionOut(1L, ts("2024-01-01 10:00:00").getTime, 2L, 2.13)))
  }

  test("streamingItemStats accumulates (pos, total) across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ItemEvent]
    val q = streamingItemStats(input.toDS())
      .writeStream.format("memory").queryName("item_stats")
      .outputMode("update").start()
    input.addData(ItemEvent(1L, 1.0), ItemEvent(1L, 0.0), ItemEvent(2L, 1.0))
    q.processAllAvailable()
    input.addData(ItemEvent(1L, 1.0))
    q.processAllAvailable()
    val last = spark.table("item_stats").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._3) }
    q.stop()
    assert(last(1L) == ((1L, 2.0, 3.0))) // matches UCBState.refit on the union
    assert(last(2L) == ((2L, 1.0, 1.0)))
  }

  test("streamingDedup keeps first arrival per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val stream = input.toDF().toDF("fp", "ts")
    val q = streamingDedup(stream, Seq("fp"), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(("a", ts("2024-01-01 10:00:00")), ("b", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // duplicate within the watermark horizon → dropped
    input.addData(("a", ts("2024-01-01 10:30:00")), ("c", ts("2024-01-01 10:31:00")))
    q.processAllAvailable()
    val keys = spark.table("deduped").collect().map(_.getString(0))
    q.stop()
    assert(keys.sorted.toSeq == Seq("a", "b", "c"))
    // batch frame: same operator, plain dropDuplicates
    val batch = Seq(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:30:00")))
      .toDF("fp", "ts")
    assert(streamingDedup(batch, Seq("fp")).count() == 1)
    // batch frame WITHOUT the ts column: allowed (one batch = one horizon)
    assert(streamingDedup(Seq("a", "a", "b").toDF("fp"), Seq("fp")).count() == 2)
    // streaming frame WITHOUT the ts column: a clear contract error, not a
    // confusing withWatermark missing-column analysis failure
    val noTs = MemoryStream[String].toDF().toDF("fp")
    val err = intercept[IllegalArgumentException] {
      streamingDedup(noTs, Seq("fp"))
    }
    assert(err.getMessage.contains("requires event-time column 'ts'"))
  }

  test("streamingApplyChanges: the parquet snapshot equals the batch replay after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdcsnap").toString
    val snap = s"$dir/snapshot"
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    base.write.parquet(snap)
    val input = MemoryStream[(Long, String, String, Long)]
    val changes = input.toDF().toDF("id", "v", "op", "version")
    val q = StreamingOps.streamingApplyChanges(changes, snap, Seq("id"))
    def snapshot() = spark.read.parquet(snap).as[(Long, String)]
      .collect().sorted.toSeq
    // batch 1: update 1, delete 2, insert 4
    val b1 = Seq((1L, "a2", "upsert", 10L), (2L, "", "delete", 10L),
      (4L, "d", "upsert", 10L))
    input.addData(b1: _*); q.processAllAvailable()
    assert(snapshot() == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
    // batch 2: re-insert 2, delete 4 — cumulative replay still matches
    val b2 = Seq((2L, "b2", "upsert", 20L), (4L, "", "delete", 20L))
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val replay = graft.core.Ops.applyChanges(
      graft.core.Ops.applyChanges(base, b1.toDF("id", "v", "op", "version"),
        Seq("id"), "version"),
      b2.toDF("id", "v", "op", "version"), Seq("id"), "version")
      .as[(Long, String)].collect().sorted.toSeq
    assert(snapshot() == replay)
    assert(snapshot() == Seq((1L, "a2"), (2L, "b2"), (3L, "c")))
  }

  test("foreachBatchRefit merges micro-batches into the batch UCBState") {
    import graft.models.UCBState
    implicit val sqlCtx = spark.sqlContext
    val b0 = Seq((0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val state = new UCBState().fit(b0)
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("query_id", "item_id", "rating")
    val q = StreamingOps.foreachBatchRefit(stream, state)
    input.addData((1L, 1L, 0.0), (2L, 2L, 1.0))
    q.processAllAvailable()
    input.addData((3L, 1L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = state.state.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((2.0, 3.0))) // pos=1+0+1, total=3
    assert(got(2L) == ((1.0, 1.0)))
  }

  test("streaming near-dup candidates accumulate across micro-batches, equal batch LSH") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.Dedup
    // near-dup pairs (i, 100+i) share identical text -> same signature,
    // same buckets; fillers are all distinct
    val dups = (0L until 6L).flatMap { i =>
      val t = s"shared content block number $i repeats across the pair exactly"
      Seq((i, t), (100L + i, t))
    }
    val fillers = (200L until 215L).map(i =>
      (i, s"unique filler text $i with nothing ${i * 31} in common ${i * 17}"))
    val all = dups ++ fillers
    val batchExpected = Dedup.minhashCandidates(
      all.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(batchExpected.nonEmpty)

    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupCandidates(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    // split so pair (5, 105) straddles the micro-batch boundary
    val (b1, b2) = all.partition { case (id, _) => id != 105L && id < 207L }
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("neardup_stream")
      .as[(Long, Long)].collect().toSet // per-band duplicates collapse here
    q.stop()
    assert(streamed == batchExpected,
      s"stream=$streamed\nbatch=$batchExpected")
    assert(streamed.contains((5L, 105L)), "cross-batch pair must be found")

    // batch mode: same operator, one 'micro-batch', empty initial state
    val batchMode = StreamingOps.streamingNearDupCandidates(
        all.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(batchMode == batchExpected)
  }

  test("streaming embedding near-dup verifies inline and equals batch lshNearDup") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.Similarity
    // 3 planted near-dup pairs (i, 100+i share a direction) + fillers
    def unit(seed: Long, dims: Int): Seq[Double] = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(dims)(rnd.nextGaussian())
    }
    val dims = 16
    val pairs = (0L until 3L).flatMap { i =>
      val v = unit(i, dims)
      Seq((i, v), (100L + i, v.map(_ * 1.01)))
    }
    val fillers = (200L until 230L).map(i => (i, unit(i, dims)))
    val all = pairs ++ fillers
    val batchExpected = Similarity.lshNearDup(all.toDF("vec_id", "embedding"),
        threshold = 0.8, planes = 4, tables = 6, dims = dims,
        guardOccupancy = false)
      .as[(Long, Long, Double)].collect().toSet
    assert(batchExpected.map(p => (p._1, p._2)) ==
      (0L until 3L).map(i => (i, 100L + i)).toSet)

    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.streamingEmbedNearDup(
        in.toDF().toDF("vec_id", "embedding"), threshold = 0.8,
        planes = 4, tables = 6, dims = dims)
      .writeStream.format("memory").queryName("embed_neardup_stream")
      .outputMode("append").start()
    // pair (2, 102) straddles the micro-batch boundary
    val (b1, b2) = all.partition { case (id, _) => id != 102L && id < 215L }
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("embed_neardup_stream")
      .as[(Long, Long, Double)].collect().toSet
    q.stop()
    assert(streamed == batchExpected,
      s"stream=$streamed\nbatch=$batchExpected")

    val batchMode = StreamingOps.streamingEmbedNearDup(
        all.toDF("vec_id", "embedding"), threshold = 0.8,
        planes = 4, tables = 6, dims = dims)
      .distinct().as[(Long, Long, Double)].collect().toSet
    assert(batchMode == batchExpected)
  }

  private def ets(s: String) = java.sql.Timestamp.valueOf(s)

  // impressions (user, imp_ts, imp_id) and conversions (user, conv_ts,
  // conv_id): conv 100 attributes to imps 1+2 (0s and 30min-exact delays,
  // both ends inclusive), conv 101 to nothing (31 min), user 2's conv only
  // to its own imp, conv 103 precedes every imp (no match)
  private val imps = Seq(
    (1L, ets("2024-01-01 10:00:00"), 1L), (1L, ets("2024-01-01 10:30:00"), 2L),
    (2L, ets("2024-01-01 10:05:00"), 3L))
  private val convs = Seq(
    (1L, ets("2024-01-01 10:30:00"), 100L), (1L, ets("2024-01-01 11:01:00"), 101L),
    (2L, ets("2024-01-01 10:10:00"), 102L), (2L, ets("2024-01-01 09:00:00"), 103L))

  test("eventTimeJoin batch: inclusive bounds, per-key isolation") {
    val out = eventTimeJoin(
        imps.toDF("user_id", "imp_ts", "imp_id"),
        convs.toDF("user_id", "conv_ts", "conv_id"),
        Seq("user_id"), "imp_ts", "conv_ts", maxDelaySeconds = 1800L)
      .select($"imp_id", $"user_id", $"conv_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 100L), (2L, 1L, 100L), (3L, 2L, 102L)))
  }

  test("eventTimeJoin stream-stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ri = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = eventTimeJoin(
        li.toDF().toDF("user_id", "imp_ts", "imp_id"),
        ri.toDF().toDF("user_id", "conv_ts", "conv_id"),
        Seq("user_id"), "imp_ts", "conv_ts", maxDelaySeconds = 1800L)
      .select($"imp_id", $"user_id", $"conv_id")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // two micro-batches split across both sides: a match must also fire
    // when the sides arrive in different batches
    li.addData(imps.take(2): _*); ri.addData(convs.take(1): _*)
    q.processAllAvailable()
    li.addData(imps.drop(2): _*); ri.addData(convs.drop(1): _*)
    q.processAllAvailable()
    val streamed = spark.table("attrib").as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(streamed == Set((1L, 1L, 100L), (2L, 1L, 100L), (3L, 2L, 102L)))
  }

  test("eventTimeJoin contract: shared non-key columns and same ts name rejected") {
    val l = imps.toDF("user_id", "imp_ts", "imp_id")
    intercept[IllegalArgumentException](eventTimeJoin(
      l, convs.toDF("user_id", "conv_ts", "imp_id"), // imp_id collides
      Seq("user_id"), "imp_ts", "conv_ts", 1800L))
    intercept[IllegalArgumentException](eventTimeJoin(
      l, l, Seq("user_id"), "imp_ts", "imp_ts", 1800L))
    intercept[IllegalArgumentException](eventTimeJoin(
      l, convs.toDF("user_id", "conv_ts", "conv_id"),
      Seq("user_id"), "imp_ts", "conv_ts", 0L))
  }

  test("windowedDistinctHll batch equals the grouped-register build cell for cell") {
    val rng = new scala.util.Random(3)
    val events = (0 until 400).map { _ =>
      (new java.sql.Timestamp(1704100000000L + rng.nextInt(8000000).toLong),
        rng.nextInt(80).toLong)
    }
    val df = events.toDF("ts", "user_id").repartition(5)
    val got = windowedDistinctHll(df, 3600L, "user_id", "ts", p = 8)
      .as[(Long, Long, Long)].collect().toSet
    val direct = graft.core.Sketch.hllRegistersByGroup(
        df.withColumn("window_start_us",
          F.expr("(unix_micros(ts) div 3600000000) * 3600000000")),
        Seq("window_start_us"), "user_id", p = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == direct)
  }

  test("windowedDistinctHll streaming: closed windows match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ets("2024-01-01 10:05:00"), 1L), (ets("2024-01-01 10:10:00"), 2L),
      (ets("2024-01-01 10:20:00"), 1L), (ets("2024-01-01 11:05:00"), 3L))
    val batch = windowedDistinctHll(
        events.toDF("ts", "user_id"), 3600L, "user_id", "ts", p = 8)
      .as[(Long, Long, Long)].collect().toSet
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = windowedDistinctHll(input.toDF().toDF("ts", "user_id"),
        3600L, "user_id", "ts", p = 8, watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("wdistinct")
      .outputMode("append").start()
    input.addData(events: _*); q.processAllAvailable()
    input.addData((ets("2024-01-02 10:00:00"), 9L)); q.processAllAvailable()
    val streamed = spark.table("wdistinct").as[(Long, Long, Long)].collect().toSet
    q.stop()
    // the day-later sentinel pushes the watermark past every original
    // window, so the append sink holds EXACTLY the batch registers
    // (the sentinel's own window stays open and unemitted)
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streamingRateLimit: window counts persist across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // 5 events for key 1 inside ONE hour window, split 3 + 2 across
    // batches: cap 3 keeps only the first batch's rows
    val rows = (0L until 5L).map(i =>
      (1L, new java.sql.Timestamp(1700000000000L + i * 60000), i + 10L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val batchTwin = graft.core.Ops.rateLimit(df, Seq("user_id"), "ts",
        "event_id", 3600L, 3)
      .select("event_id").as[Long].collect().toSet
    val batchMode = streamingRateLimit(df, "user_id", "ts", "event_id",
        3600L, 3).map(_.tie).collect().toSet
    assert(batchMode == batchTwin && batchTwin == Set(10L, 11L, 12L))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = streamingRateLimit(
        input.toDF().toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", 3600L, 3)
      .writeStream.format("memory").queryName("srate")
      .outputMode("append").start()
    input.addData(rows.take(3): _*); q.processAllAvailable()
    input.addData(rows.drop(3): _*); q.processAllAvailable()
    val streamed = spark.table("srate").as[RateEvent].collect()
      .map(_.tie).toSet
    q.stop()
    assert(streamed == batchTwin, s"streamed=$streamed batch=$batchTwin")
  }

  test("streamingCusum: first breach across micro-batches equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    // key 1 drifts (+8 over target each step, breach at the 4th event —
    // in batch TWO); key 2 stays flat and never alarms
    val rows =
      (0L until 6L).map(i =>
        (1L, new java.sql.Timestamp(1700000000000L + i * 1000), i + 1L, 10L)) ++
      (0L until 6L).map(i =>
        (2L, new java.sql.Timestamp(1700000000000L + i * 1000), i + 50L, 2L))
    val df = rows.toDF("user_id", "ts", "event_id", "v")
    val batchTwin = graft.core.Ops.cusumAlarm(df, Seq("user_id"), "ts",
        "event_id", "v", target = 2L, threshold = 30L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(batchTwin(2L).isEmpty && batchTwin(1L).isDefined)
    val batchMode = streamingCusum(df, "user_id", "ts", "event_id", "v",
        2L, 30L).collect().map(a => a.key -> a.alarm_ts_us).toMap
    assert(batchMode == Map(1L -> batchTwin(1L).get))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Long)]
    val q = streamingCusum(
        input.toDF().toDF("user_id", "ts", "event_id", "v"),
        "user_id", "ts", "event_id", "v", 2L, 30L)
      .writeStream.format("memory").queryName("scusum")
      .outputMode("append").start()
    input.addData(rows.filter(_._2.getTime < 1700000003000L): _*)
    q.processAllAvailable()
    input.addData(rows.filter(_._2.getTime >= 1700000003000L): _*)
    q.processAllAvailable()
    val streamed = spark.table("scusum").as[CusumAlarm].collect()
      .map(a => a.key -> a.alarm_ts_us).toMap
    q.stop()
    assert(streamed == batchMode, s"streamed=$streamed batch=$batchMode")
  }

  test("streamingGoldenRecord: per-attribute latest non-null across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 1L, Some("a1"), None: Option[String]),
      (1L, 2L, None, Some("x")),
      (1L, 3L, Some("a3"), None),          // batch 2
      (2L, 9L, Some("p"), Some("q")))
    val df = rows.toDF("k", "version", "va", "vb")
    val batchMode = StreamingOps.streamingGoldenRecord(df, "k", "version",
        "va", "vb")
      .collect().map(g => g.key -> ((g.a, g.b, g.n_merged))).toMap
    val batchTwin = graft.core.Ops.goldenRecord(df, Seq("k"), "version",
        Seq("va", "vb"))
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(batchMode == batchTwin)
    assert(batchMode(1L) == ((Some("a3"), Some("x"), 3L)))
    val input = MemoryStream[(Long, Long, Option[String], Option[String])]
    val q = StreamingOps.streamingGoldenRecord(
        input.toDF().toDF("k", "version", "va", "vb"),
        "k", "version", "va", "vb")
      .writeStream.format("memory").queryName("sgolden")
      .outputMode("append").start()
    input.addData(rows.take(2): _*); q.processAllAvailable()
    input.addData(rows.drop(2): _*); q.processAllAvailable()
    // LAST emission per key = the final golden (dedup by max n_merged)
    val streamed = spark.table("sgolden").as[StreamingOps.GoldenOut]
      .collect().groupBy(_.key).view
      .mapValues(gs => { val g = gs.maxBy(_.n_merged)
        (g.a, g.b, g.n_merged) }).toMap
    q.stop()
    assert(streamed == batchTwin, s"streamed=$streamed")
  }

  test("streamingEwma: exact integer recurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // x = 3,1,2 at α=7/10: s = 3, (7+9)//10=1, (14+3)//10=1
    val rows = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), 1L, 3L),
      (1L, new java.sql.Timestamp(1700000001000L), 2L, 1L),
      (1L, new java.sql.Timestamp(1700000002000L), 3L, 2L),
      (2L, new java.sql.Timestamp(1700000000500L), 4L, -9L)) // s1 = x1
    val df = rows.toDF("user_id", "ts", "event_id", "v")
    val batchMode = StreamingOps.streamingEwma(df, "user_id", "ts",
        "event_id", "v", 7L, 10L)
      .collect().map(p => (p.key, p.tie) -> p.ewma).toMap
    assert(batchMode == Map((1L, 1L) -> 3L, (1L, 2L) -> 1L,
      (1L, 3L) -> 1L, (2L, 4L) -> -9L))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Long)]
    val q = StreamingOps.streamingEwma(
        input.toDF().toDF("user_id", "ts", "event_id", "v"),
        "user_id", "ts", "event_id", "v", 7L, 10L)
      .writeStream.format("memory").queryName("sewma")
      .outputMode("append").start()
    input.addData(rows.take(1): _*); q.processAllAvailable()
    input.addData(rows.drop(1): _*); q.processAllAvailable() // state carries s1
    val streamed = spark.table("sewma").as[StreamingOps.EwmaPoint]
      .collect().map(p => (p.key, p.tie) -> p.ewma).toMap
    q.stop()
    assert(streamed == batchMode, s"streamed=$streamed")
    intercept[IllegalArgumentException](
      StreamingOps.streamingEwma(df, "user_id", "ts", "event_id", "v", 11L, 10L))
  }

  test("streamingTransitions: cross-batch pair equals batch lag pairs") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "view", new java.sql.Timestamp(1700000000000L), 1L),
      (1L, "click", new java.sql.Timestamp(1700000001000L), 2L),
      (1L, "purchase", new java.sql.Timestamp(1700000002000L), 3L), // batch 2
      (2L, "signup", new java.sql.Timestamp(1700000000500L), 4L))   // no pair
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    // batch lag pairs = the batch operator's input to counting
    val expected = Set(("view", "click"), ("click", "purchase"))
    val batchMode = StreamingOps.streamingTransitions(df, "user_id",
        "event_type", "ts", "event_id")
      .collect().map(p => (p.from_type, p.to_type)).toSet
    assert(batchMode == expected)
    // counts over the pairs ≡ Ops.transitionCounts
    val fromPairs = StreamingOps.streamingTransitions(df, "user_id",
        "event_type", "ts", "event_id").toDF()
      .groupBy("from_type", "to_type").count()
      .as[(String, String, Long)].collect().toSet
    val batchCounts = graft.core.Ops.transitionCounts(df, "user_id",
        "event_type", "ts", Seq("event_id"))
      .select("from_type", "to_type", "cnt")
      .as[(String, String, Long)].collect().toSet
    assert(fromPairs == batchCounts)
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = StreamingOps.streamingTransitions(
        input.toDF().toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id")
      .writeStream.format("memory").queryName("strans")
      .outputMode("append").start()
    input.addData(rows.take(2): _*); q.processAllAvailable()
    input.addData(rows.drop(2): _*); q.processAllAvailable() // straddles
    val streamed = spark.table("strans").as[StreamingOps.TransPair]
      .collect().map(p => (p.from_type, p.to_type)).toSet
    q.stop()
    assert(streamed == expected, s"streamed=$streamed")
  }

  test("streamingFunnel: 2-batch stream and batch mode equal the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "purchase")
    val rows = Seq(
      // user 1 completes across the batch boundary
      (1L, "signup", ets("2024-01-01 10:00:00"), 1L),
      (1L, "view", ets("2024-01-01 11:00:00"), 2L),
      (1L, "purchase", ets("2024-01-02 10:00:00"), 5L),
      // user 2: out-of-order types — stops at signup
      (2L, "view", ets("2024-01-01 09:00:00"), 3L),
      (2L, "signup", ets("2024-01-01 10:00:00"), 4L),
      // user 3: view past the 1-day window
      (3L, "signup", ets("2024-01-01 08:00:00"), 6L),
      (3L, "view", ets("2024-01-02 08:00:01"), 7L))
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    val batchTwin = graft.core.Funnel.funnelUsers(df, "user_id",
        "event_type", "ts", steps, Some(F.expr("INTERVAL 1 DAYS")))
      .select(F.col("user_id"), F.col("step"), F.col("step_name"),
        F.unix_micros(F.col("ts")).as("ts_us"))
      .as[FunnelHit].collect().toSet
    // batch-mode run of the stateful operator
    val batchMode = streamingFunnel(df, "user_id", "event_type", "ts",
      "event_id", steps, Some(86400L)).collect().toSet
    assert(batchMode == batchTwin)
    // real 2-batch stream split at the day boundary, time-ordered feed
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = streamingFunnel(
        input.toDF().toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id", steps, Some(86400L))
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    val (b1, b2) = rows.partition(_._3.getTime < ets("2024-01-02 00:00:00").getTime)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    val streamedHits = spark.table("sfunnel").as[FunnelHit].collect().toSet
    q.stop()
    assert(streamedHits == batchTwin, s"streamed=$streamedHits batch=$batchTwin")
  }

  test("streamingBiasStats: 2-batch stream state equals BiasModel.pairStats; fitFromStats bit-exact") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 10L, 4.0), (1L, 20L, 2.0), (2L, 10L, 5.0),
      (1L, 10L, 3.0), (2L, 30L, 1.0), (3L, 20L, 4.5))
    val df = rows.toDF("query_id", "item_id", "rating")
    val m0 = new graft.models.BiasModel()
    val batchStats = m0.pairStats(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 2-batch stream split so pair (1,10) STRADDLES the boundary
    val input = MemoryStream[RatingEvent]
    def ev(t: (Long, Long, Double)) =
      RatingEvent(t._1, t._2, math.floor(t._3 * 1e6).toLong)
    val q = streamingBiasStats(input.toDS())
      .writeStream.format("memory").queryName("bias_stats")
      .outputMode("update").start()
    input.addData(rows.take(3).map(ev): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3).map(ev): _*)
    q.processAllAvailable()
    // update mode: keep the LAST emission per pair (max n wins)
    val streamed = spark.table("bias_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._4)).toSet
    q.stop()
    assert(streamed == batchStats, s"streamed=$streamed batch=$batchStats")
    // and the rebuilt model equals the batch fit on every prediction
    val pairs = df.select("query_id", "item_id").distinct()
    val full = new graft.models.BiasModel().fit(df).predictPairs(pairs, df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val m1 = new graft.models.BiasModel()
    m1.fitFromStats(rows.map(ev).toDS().groupBy("query_id", "item_id")
      .agg(F.sum("r_ppm").cast("long").as("s_ppm"),
        F.count(F.lit(1)).as("n")))
    val rebuilt = m1.predictPairs(pairs, df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rebuilt == full)
  }

  test("streamingRepeatStats: 2-batch stream state equals RepeatRec.pairStats; rebuild bit-exact") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), (1L, 20L, ts("2024-01-02 10:00:00")),
      (2L, 10L, ts("2024-01-03 10:00:00")),
      (1L, 10L, ts("2024-01-04 10:00:00")), // re-consumption straddles batches
      (2L, 10L, ts("2024-01-01 09:00:00"))) // out-of-order: max must win
    val df = rows.toDF("query_id", "item_id", "timestamp")
    val m0 = new graft.models.RepeatRec()
    val batchStats = m0.pairStats(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val input = MemoryStream[StreamingOps.RepeatEvent]
    def ev(t: (Long, Long, java.sql.Timestamp)) =
      StreamingOps.RepeatEvent(t._1, t._2, t._3.getTime * 1000L)
    val q = StreamingOps.streamingRepeatStats(input.toDS())
      .writeStream.format("memory").queryName("repeat_stats")
      .outputMode("update").start()
    input.addData(rows.take(3).map(ev): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3).map(ev): _*)
    q.processAllAvailable()
    val streamed = spark.table("repeat_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._4)).toSet
    q.stop()
    assert(streamed == batchStats, s"streamed=$streamed batch=$batchStats")
    val m1 = new graft.models.RepeatRec()
    m1.fitFromStats(streamed.toSeq
      .toDF("query_id", "item_id", "last_ts_us", "cnt"))
    val full = new graft.models.RepeatRec()
    full.fit(df)
    def preds(m: graft.models.RepeatRec) =
      m.predict(df, k = 5, filterSeen = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(preds(m1) == preds(full))
  }

  test("streamingSlopeOneDeltas: cross-batch deltas rebuild the batch deviation table and fit") {
    implicit val sqlCtx = spark.sqlContext
    // distinct (query, item) pairs — the documented contract
    val rows = Seq(
      (1L, 10L, 4.0), (1L, 20L, 2.0), (1L, 30L, 5.0),
      (2L, 10L, 3.0), (2L, 20L, 4.0),
      (3L, 30L, 1.0))
    val df = rows.toDF("query_id", "item_id", "rating")
    val m0 = new graft.models.SlopeOne(maxUserHistory = 0)
    m0.fit(df)
    val batchDevs = m0.deviations.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def ev(t: (Long, Long, Double)) =
      RatingEvent(t._1, t._2, math.floor(t._3 * 1e6).toLong)
    // stream split so user 1's history STRADDLES the batch boundary
    val input = MemoryStream[RatingEvent]
    val q = streamingSlopeOneDeltas(input.toDS())
      .writeStream.format("memory").queryName("slope_deltas")
      .outputMode("append").start()
    input.addData(rows.take(2).map(ev): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2).map(ev): _*)
    q.processAllAvailable()
    val half = spark.table("slope_deltas")
      .groupBy("item_from", "item_to")
      .agg(F.sum("n").cast("long").as("n"),
        F.sum("dev_ppm").cast("long").as("dev_ppm"))
    val ratings = rows.map(ev).toDS().toDF()
      .withColumnRenamed("r_ppm", "r_ppm")
    val m1 = new graft.models.SlopeOne(maxUserHistory = 0)
    m1.fitFromStats(half, ratings)
    val streamedDevs = m1.deviations.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()
    assert(streamedDevs == batchDevs,
      s"streamed=$streamedDevs batch=$batchDevs")
    // duplicate arrival of the same (user, item): dropped defensively
    val dupDeltas = streamingSlopeOneDeltas(
      Seq(ev((9L, 1L, 2.0)), ev((9L, 1L, 2.0)), ev((9L, 2L, 3.0))).toDS())
      .collect()
    assert(dupDeltas.length == 1 && dupDeltas.head.n == 1L)
    // and full prediction parity vs the batch fit
    val pairs = df.select("query_id", "item_id").distinct()
    def preds(m: graft.models.SlopeOne) = m.predictPairs(pairs, df)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(preds(m1) == preds(m0))
  }
}
