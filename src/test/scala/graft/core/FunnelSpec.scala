package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val steps = Seq("signup", "view", "purchase")

  private def run(rows: Seq[(Long, String, Timestamp)],
      window: Option[String] = Some("INTERVAL 7 DAYS")): Map[(Long, Long), (String, Long)] =
    Funnel.funnelUsers(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps,
        window.map(F.expr))
      .select(F.col("user_id"), F.col("step"), F.col("step_name"),
        F.unix_micros(F.col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect()
      .map { case (u, st, n, us) => (u, st) -> ((n, us)) }.toMap

  test("hand-computed funnel: order, first-touch, window cutoff") {
    val rows = Seq(
      // user 1 completes all three in order
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-02 00:00:00")),
      (1L, "view", ts("2024-01-03 00:00:00")), // later view ignored (first-touch)
      (1L, "purchase", ts("2024-01-04 00:00:00")),
      // user 2: purchase BEFORE view — stops at view
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-02 00:00:00")),
      (2L, "view", ts("2024-01-03 00:00:00")),
      // user 3: view outside the 7-day window — stops at signup
      (3L, "signup", ts("2024-01-01 00:00:00")),
      (3L, "view", ts("2024-01-09 00:00:01")),
      // user 4: never signed up — absent entirely
      (4L, "view", ts("2024-01-01 00:00:00")))
    val r = run(rows)
    assert(r.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (3L, 1L)))
    assert(r((1L, 2L))._2 == ts("2024-01-02 00:00:00").getTime * 1000)
    assert(r((1L, 3L))._1 == "purchase")
  }

  test("equal timestamps do not advance (strictly-after semantics)") {
    val r = run(Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-01 00:00:00"))))
    assert(r.keySet == Set((1L, 1L)))
  }

  test("window boundary is inclusive at exactly t1 + window") {
    val r = run(Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-08 00:00:00"))))
    assert(r.keySet == Set((1L, 1L), (1L, 2L)))
  }

  test("no window: any later event counts") {
    val r = run(Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2025-06-01 00:00:00"))), window = None)
    assert(r.keySet == Set((1L, 1L), (1L, 2L)))
  }

  test("cohorts are nested and funnelSteps ppm math is exact") {
    val rows =
      (1L to 10L).map(u => (u, "signup", ts("2024-01-01 00:00:00"))) ++
      (1L to 6L).map(u => (u, "view", ts("2024-01-02 00:00:00"))) ++
      (1L to 3L).map(u => (u, "purchase", ts("2024-01-03 00:00:00")))
    val st = Funnel.funnelSteps(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, Some(F.expr("INTERVAL 7 DAYS")))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(st(1L) == ((10L, 1000000L, 1000000L)))
    assert(st(2L) == ((6L, 600000L, 600000L)))
    assert(st(3L) == ((3L, 300000L, 500000L)))
  }

  test("retentionCohorts: hand-computed weekly cohorts, offset-0 invariant") {
    val wk = 604800L
    def at(week: Long, off: Long = 0L) =
      new Timestamp((week * wk + off) * 1000L)
    val rows = Seq(
      // cohort 0: users 1, 2 sign up in week 0
      (1L, "signup", at(0)), (2L, "signup", at(0, 3600)),
      // user 1 active in weeks 1 and 2 (relative to ITS anchor)
      (1L, "click", at(1, 10)), (1L, "view", at(2, 20)),
      // user 2 active only in week 1
      (2L, "click", at(1, 7200)),
      // cohort 3: user 5, never active again
      (5L, "signup", at(3)),
      // activity BEFORE the anchor is ignored; unanchored user absent
      (5L, "view", at(2, 500)), (9L, "click", at(0)))
    val r = Funnel.retentionCohorts(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", "signup", Seq("signup", "click", "view"),
        wk)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    assert(r == Map(
      (0L, 0L) -> ((2L, 2L, 1000000L)), // offset 0 = anchors themselves
      (0L, 1L) -> ((2L, 2L, 1000000L)),
      (0L, 2L) -> ((1L, 2L, 500000L)),
      (3L, 0L) -> ((1L, 1L, 1000000L))))
  }

  test("sessionPaths: gap splits, order within session, shares") {
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1, session 1: A>B ; session 2 (after 1h gap): A>B
      (1L, "A", t(0), 1L), (1L, "B", t(60), 2L),
      (1L, "A", t(4000), 3L), (1L, "B", t(4060), 4L),
      // user 2: single-event session C; simultaneous pair ordered by id
      (2L, "C", t(0), 5L),
      (2L, "X", t(9000), 7L), (2L, "Y", t(9000), 6L))
    val r = Funnel.sessionPaths(rows.toDF("user_id", "event_type", "ts", "id"),
        "user_id", "event_type", "ts", "id", gapSeconds = 1800L)
      .as[(String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // 4 sessions total: A>B ×2, C, Y>X (tie broken by id 6 < 7)
    assert(r == Map("A>B" -> ((2L, 500000L)), "C" -> ((1L, 250000L)),
      "Y>X" -> ((1L, 250000L))))
    // minCount trims rare paths but keeps the full-denominator share
    val trimmed = Funnel.sessionPaths(
        rows.toDF("user_id", "event_type", "ts", "id"),
        "user_id", "event_type", "ts", "id", 1800L, minCount = 2L)
      .as[(String, Long, Long)].collect().toSeq
    assert(trimmed == Seq(("A>B", 2L, 500000L)))
  }

  test("sessionPaths: exact gap boundary starts a new session (Sessionizer rule)") {
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq((1L, "A", t(0), 1L), (1L, "B", t(1800), 2L))
    val r = Funnel.sessionPaths(rows.toDF("user_id", "event_type", "ts", "id"),
        "user_id", "event_type", "ts", "id", 1800L)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(r == Set("A", "B")) // gap >= 1800s closes the session
  }

  test("funnelDelays: per-step delay stats, exact integer report") {
    val rows = Seq(
      // user 1: view after 60s, purchase after another 120s
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "view", ts("2024-01-01 00:01:00")),
      (1L, "purchase", ts("2024-01-01 00:03:00")),
      // user 2: view after 180s, never purchases
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 00:03:00")))
    val r = Funnel.funnelDelays(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps,
        Some(F.expr("INTERVAL 7 DAYS")))
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._3, x._4, x._5, x._6, x._7))).toMap
    // step 2: delays 60s, 180s → mean 120s, median 120s (interpolated)
    assert(r(2L) == ((2L, 60000000L, 180000000L, 120000000L, 240000000L)))
    // step 3: one delay of 120s; med2 = 2·120s
    assert(r(3L) == ((1L, 120000000L, 120000000L, 120000000L, 240000000L)))
  }

  test("rfmSegments: exact quintile scores on a 10-entity ladder") {
    // entity i: i rows of amount i on day i → frequency=i, monetary=i²,
    // recency_days=10−i. All three ladders are monotone, so every score
    // column is the quintile pattern 1,1,2,2,3,3,4,4,5,5 (boundaries
    // 2.8/4.6/6.4/8.2 etc. from exact interpolated percentiles).
    val rows = for (i <- 1 to 10; _ <- 1 to i) yield
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"),
        i.toLong)
    val r = Funnel.rfmSegments(rows.toDF("cust", "ts", "amt").repartition(4),
        "cust", "ts", "amt")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val quint = Array(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L)
    for (i <- 1 to 10) {
      val (_, rec, freq, mon, rs, fs, ms, seg) = r(i.toLong)
      assert(rec == 10L - i && freq == i.toLong && mon == i.toLong * i)
      assert(fs == quint(i - 1) && ms == quint(i - 1) && rs == quint(i - 1),
        s"entity $i scores ($rs,$fs,$ms)")
      assert(seg == rs * 100 + fs * 10 + ms)
    }
  }

  test("survivalHazard: at-risk suffix counts and exact hazards") {
    val df = Seq((1L, 1L), (1L, 0L), (2L, 1L), (3L, 0L))
      .toDF("dur", "ev").repartition(3)
    val r = Funnel.survivalHazard(df, "dur", "ev")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((4L, 1L, 1L, 250000L)))
    assert(r(2L) == ((2L, 1L, 0L, 500000L)))
    assert(r(3L) == ((1L, 0L, 1L, 0L)))
  }

  test("ltvCohorts: first-event cohorts, cumulative cents, per-user floor") {
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    val rows = Seq(
      (1L, t(0, 1), 100L), (1L, t(1, 2), 50L), // u1: cohort day 0
      (2L, t(0, 5), 0L), (2L, t(1, 1), 10L),   // u2: cohort day 0
      (3L, t(1, 3), 7L))                        // u3: cohort day 1
      .toDF("u", "ts", "cents")
    val r = Funnel.ltvCohorts(rows.repartition(3), "u", "ts", "cents",
        periodSeconds = 86400L)
      .select("cohort_period", "age_periods", "users_active", "cents",
        "cum_cents", "cum_cents_per_user")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6))).toMap
    val c0 = r.keys.map(_._1).min // day-0 cohort period id
    assert(r((c0, 0L)) == ((2L, 100L, 100L, 50L)))
    assert(r((c0, 1L)) == ((2L, 60L, 160L, 80L)))
    assert(r((c0 + 1, 0L)) == ((1L, 7L, 7L, 7L)))
  }

  test("attributionCredits: first/last/linear hand-computed, window cutoff") {
    val base = 1700000000000L
    def t(deltaS: Long) = new java.sql.Timestamp(base + deltaS * 1000)
    val rows = Seq(
      (1L, "view", t(-7000), 1L),     // outside every lookback window
      (1L, "view", t(-120), 2L),
      (1L, "click", t(-60), 3L),
      (1L, "purchase", t(0), 4L),     // conv 1: k=2 (view, click)
      (1L, "click", t(540), 5L),
      (1L, "purchase", t(600), 6L))   // conv 2: k=3 (view, click, click)
      .toDF("u", "et", "ts", "id")
    val r = Funnel.attributionCredits(rows.repartition(3), "u", "et", "ts",
        "id", "purchase", windowSeconds = 3600L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    assert(r("view") == ((2L, 2L, 0L, 833333L)))   // 500000 + 333333
    assert(r("click") == ((3L, 0L, 2L, 1166666L))) // 500000 + 2·333333
    assert(r.size == 2)
    intercept[IllegalArgumentException](
      Funnel.attributionCredits(rows, "u", "et", "ts", "id", "purchase", 0L))
  }

  test("sessionStats: gap rule, bounce share, exact means") {
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val rows = Seq(
      (1L, t(0), 1L), (1L, t(10), 2L),  // session A: 2 events, 10 s
      (1L, t(2000), 3L),                // gap ≥ 1800 s → bounce
      (2L, t(50), 4L))                  // bounce
      .toDF("u", "ts", "id")
    val r = Funnel.sessionStats(rows.repartition(3), "u", "ts", "id", 1800L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((3L, 2L, 666666L, 1333333L, 3333333L)))
  }

  test("trending: period-over-period ratio, gap documented, first NULL") {
    def t(day: Int) = new java.sql.Timestamp(1700000000000L
      + day.toLong * 86400000L)
    // key a: day-period counts 2, 4, (gap), 1
    val rows = Seq(("a", t(0)), ("a", t(0)), ("a", t(1)), ("a", t(1)),
      ("a", t(1)), ("a", t(1)), ("a", t(3)), ("b", t(0)))
      .toDF("k", "ts")
    val r = Funnel.trending(rows.repartition(3), Seq("k"), "ts",
        periodSeconds = 86400L)
      .select("k", "cnt", "prev_cnt", "trend_ppm")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    assert(r(("a", 2L)) == ((None, None)))
    assert(r(("a", 4L)) == ((Some(2L), Some(2000000L))))
    assert(r(("a", 1L)) == ((Some(4L), Some(250000L)))) // vs last observed
    assert(r(("b", 1L)) == ((None, None)))
  }

  test("activeUsers: trailing-window distinct, stickiness exact") {
    def t(day: Int, u: Long) = (u, new java.sql.Timestamp(1700006400000L
      + day.toLong * 86400000L))
    // day0: {1,2}; day1: {2}; day8: {3} (outside day1's window)
    val rows = Seq(t(0, 1L), t(0, 1L), t(0, 2L), t(1, 2L), t(8, 3L))
      .toDF("u", "ts")
    val r = Funnel.activeUsers(rows.repartition(3), "u", "ts")
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    val d0 = r.keys.min
    assert(r(d0) == ((2L, 2L, 1000000L)))
    assert(r(d0 + 1) == ((1L, 2L, 500000L))) // WAU covers day0 users
    assert(r(d0 + 8) == ((1L, 1L, 1000000L))) // window slid past day1
  }

  test("empty step cohorts vanish; duplicate step names rejected") {
    val r = run(Seq((1L, "view", ts("2024-01-01 00:00:00"))))
    assert(r.isEmpty)
    intercept[IllegalArgumentException] {
      Funnel.funnelUsers(Seq((1L, "a", ts("2024-01-01 00:00:00")))
        .toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("a", "a"))
    }
  }
}
