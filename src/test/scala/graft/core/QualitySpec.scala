package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import Quality._

  private def report(df: org.apache.spark.sql.DataFrame,
      cs: Seq[Constraint]): Map[(String, String), (Long, Long, Boolean)] =
    Quality.check(df, cs)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("constraint verdicts hand-computed on a crafted table") {
    val df = Seq(
      (1L, Some("a@x.io"), 10.0), (2L, Some("b@y.io"), 20.0),
      (3L, None, 150.0), (4L, Some("nope"), 30.0))
      .toDF("id", "email", "v")
    val r = report(df, Seq(
      Complete("email", 750000L), Complete("id"),
      Unique("id"), Unique("email"),
      InRange("v", 0.0, 100.0, 750000L),
      MatchesPattern("email", "^[a-z]+@[a-z.]+$", 500000L),
      RowCount(4L, 4L)))
    assert(r(("complete", "email")) == ((750000L, 750000L, true)))
    assert(r(("complete", "id")) == ((1000000L, 1000000L, true)))
    assert(r(("unique", "id")) == ((4L, 4L, true)))
    // 3 distinct non-null emails vs 4 rows: PK semantics fail
    assert(r(("unique", "email")) == ((3L, 4L, false)))
    assert(r(("in_range", "v")) == ((750000L, 750000L, true)))
    assert(r(("pattern", "email")) == ((500000L, 500000L, true)))
    assert(r(("row_count", "*")) == ((4L, 4L, true)))
  }

  test("referential integrity counts exactly the dangling keys") {
    val fact = Seq((1L, 10L), (2L, 11L), (3L, 99L), (4L, 98L))
      .toDF("id", "fk")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val r = report(fact, Seq(RefersTo("fk", dim, "pk")))
    assert(r(("refers_to", "fk")) == ((2L, 0L, false)))
    // null FKs are not dangling
    val withNull = Seq((1L, Some(10L)), (2L, None)).toDF("id", "fk")
    assert(report(withNull, Seq(RefersTo("fk", dim, "pk")))(("refers_to", "fk"))
      == ((0L, 0L, true)))
  }

  test("InSet ratios and failing verdicts") {
    val df = (1L to 10L).map(i => (i, if (i <= 7) "ok" else "bad"))
      .toDF("id", "s")
    val r = report(df, Seq(InSet("s", Seq("ok"), 800000L)))
    assert(r(("in_set", "s")) == ((700000L, 800000L, false)))
  }

  test("profile: typed metrics per column in one pass, long format") {
    val df = Seq((Some(5L), "alpha", 1.5), (None, "be", 1.5),
      (Some(2L), "alpha", 2.0)).toDF("id", "name", "score")
    val p = Quality.profile(df.repartition(2))
      .as[(String, String, Option[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(p(("*", "rows")).contains(3L))
    assert(p(("id", "nulls")).contains(1L))
    assert(p(("id", "distinct")).contains(2L))
    assert(p(("id", "min")).contains(2L) && p(("id", "max")).contains(5L))
    assert(p(("name", "distinct")).contains(2L))
    assert(p(("name", "min_len")).contains(2L))
    assert(p(("name", "max_len")).contains(5L))
    assert(p(("score", "distinct")).contains(2L)) // doubles: no min/max
    assert(!p.contains(("score", "min")))
    assert(p.size == 4 + 4 + 2 + 1)
  }

  test("profile: a source column whose NAME contains '__' parses intact") {
    // pre-r11 the (column, metric) recovery split on the FIRST "__", so
    // `a__b` mis-parsed to col 'a' / metric 'b__nulls' (ADVICE r10)
    val df = Seq((1L, "x"), (2L, "y")).toDF("a__b", "plain")
    val p = Quality.profile(df)
      .as[(String, String, Option[Long])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(p(("a__b", "nulls")).contains(0L))
    assert(p(("a__b", "distinct")).contains(2L))
    assert(p(("a__b", "min")).contains(1L) && p(("a__b", "max")).contains(2L))
    assert(!p.keys.exists(_._1 == "a"))
  }

  test("dateGaps: holes between present periods, contiguous empty") {
    def t(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 13:00:00")
    val df = Seq(1, 2, 3, 7, 8, 12, 12).map(d => Tuple1(t(d))).toDF("ts")
    val gaps = Quality.dateGaps(df.repartition(3), "ts")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // period ids are absolute day numbers; deltas are what matters
    assert(gaps.map(g => (g._2 - g._1, g._3)) == Seq((4L, 3L), (4L, 3L)))
    assert(Quality.dateGaps(Seq(1, 2, 3).map(d => Tuple1(t(d))).toDF("ts"),
      "ts").count() == 0L)
  }

  test("empty suite rejected; empty table passes ratio rules vacuously") {
    intercept[IllegalArgumentException](Quality.check(
      Seq((1L, 1L)).toDF("a", "b"), Nil))
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val r = report(empty, Seq(Complete("s"), RowCount(1L, 10L)))
    assert(r(("complete", "s"))._1 == 1000000L)
    assert(r(("row_count", "*")) == ((0L, 1L, false)))
  }
}
