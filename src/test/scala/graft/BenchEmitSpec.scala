package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bench stdout-line contract: the driver keeps only the last
  * ~2000 chars of stdout (and sbt appends a ~110-char success trailer), so
  * the one JSON line must stay under [[Bench.MaxLineBytes]] no matter how
  * many headline rows exist. Round 8's full-precision 72-row line overflowed
  * the window and the official sweep recorded `parsed: null`.
  */
class BenchEmitSpec extends AnyFunSuite with Matchers {

  private def syntheticRows(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"synthetic_headline_row_$i%02d", i * 0.777))

  test("short result sets emit untrimmed, valid-shape lines") {
    val rows = syntheticRows(5)
    val (line, detail) = Bench.renderEmit(rows, "/root/testdata/sf0.1", Some((3.886, -1.0, 3.469)))
    line shouldBe detail
    line.length should be <= Bench.MaxLineBytes
    line should startWith("""{"metric":"total","value":""")
    line should include(""""calibration":{"start":3.886,"end":3.469}""")
    line should not include "omitted"
    rows.foreach { case (k, _) => line should include("\"" + k + "\":") }
  }

  test("oversized result sets trim to budget, keep failures, baseline rows, and expensive rows") {
    val rows = syntheticRows(90) ++ Seq(("failed_row_alpha", -1.0), ("failed_row_beta", -1.0),
      ("model_wilson", 1.6)) // cheap but baseline-comparable — must survive
    val (line, detail) = Bench.renderEmit(rows, "/root/testdata/sf0.1", Some((3.886, -1.0, 3.469)))
    line.length should be <= Bench.MaxLineBytes
    // every failed row survives the trim
    line should include(""""failed_row_alpha":-1""")
    line should include(""""failed_row_beta":-1""")
    line should include(""""model_wilson":1.6""")
    // the most expensive rows survive; the cheapest are the ones trimmed
    line should include("synthetic_headline_row_90")
    line should not include "\"synthetic_headline_row_01\""
    line should include(""""omitted":""")
    line should include("BENCH_DETAIL.json")
    // detail file content keeps everything
    rows.foreach { case (k, _) => detail should include("\"" + k + "\":") }
    // the line's total covers ALL rows, not just the emitted subset
    val total = rows.map(_._2).filter(_ >= 0).sum
    line should include(s""""value":${Bench.fmt(total)}""")
  }

  test("fmt is compact and locale-stable") {
    Bench.fmt(8.781467) shouldBe "8.781"
    Bench.fmt(0.68) shouldBe "0.68"
    Bench.fmt(-1.0) shouldBe "-1"
    Bench.fmt(12.0) shouldBe "12"
    Bench.fmt(0.0005) shouldBe "0.001"
  }

  test("the real 72-row headline set fits worst-case in the budget") {
    // worst case: every headline row present with a 4-digit-second value
    val rows = Bench.headline.map(n => (n, 9999.999))
    val (line, _) = Bench.renderEmit(rows, "/root/testdata/sf0.1", Some((9999.999, 9999.999, 9999.999)), drift = Some(2537.563))
    line.length should be <= Bench.MaxLineBytes
  }

  test("the driver-budget set emits UNTRIMMED worst-case — every row visible") {
    val rows = Bench.driverSet.map(n => (n, 9999.999))
    val (line, detail) = Bench.renderEmit(rows, "/root/testdata/sf0.1", Some((9999.999, 9999.999, 9999.999)), drift = Some(2537.563))
    line shouldBe detail // nothing trimmed: the driver sees every row
    line.length should be <= Bench.MaxLineBytes
    Bench.BaselineRows.foreach(b => Bench.driverSet should contain(b))
  }

  test("calibration mid and drift render only when present; drift flags a hot box") {
    val rows = syntheticRows(3)
    val (line, _) = Bench.renderEmit(rows, "/root/testdata/sf0.1",
      Some((25.931, 12.4, 7.741)), drift = Bench.calibrationDrift(Some((25.931, 12.4, 7.741)), "32"))
    line should include(""""calibration":{"start":25.931,"mid":12.4,"end":7.741}""")
    line should include(""""calibration_drift":6.581""") // 25.931 / 3.94
    // inside the band: no flag; non-32-core runs never flag
    Bench.calibrationDrift(Some((3.886, -1.0, 3.469)), "32") shouldBe None
    Bench.calibrationDrift(Some((25.931, -1.0, 7.741)), "8") shouldBe None
  }

  test("mergePrior folds prior same-sf detail rows under the current run") {
    val dir = java.nio.file.Files.createTempDirectory("benchmerge")
    val p = dir.resolve("BENCH_DETAIL.json")
    val prior = Seq(("old_only_row", 3.5), ("shared_row", 9.0))
    val (_, detail) = Bench.renderEmit(prior, "/root/testdata/sf0.1", None)
    java.nio.file.Files.write(p, (detail + "\n").getBytes("UTF-8"))
    val cur = Seq(("shared_row", 4.2), ("new_row", 1.1))
    val merged = Bench.mergePrior(p, "/root/testdata/sf0.1", cur)
    merged.toMap shouldBe Map("old_only_row" -> 3.5, "shared_row" -> 4.2, "new_row" -> 1.1)
    // different sf: prior rows must NOT leak in
    Bench.mergePrior(p, "/root/testdata/sf0.01", cur) shouldBe cur
    // missing file: identity
    Bench.mergePrior(dir.resolve("absent.json"), "/root/testdata/sf0.1", cur) shouldBe cur
  }
}
