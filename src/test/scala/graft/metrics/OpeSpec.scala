package graft.metrics

import graft.SparkSpec

class OpeSpec extends SparkSpec {
  import spark.implicits._

  // 4 logged rounds: queries 0..3, actions {0,0,1,1}, rewards {1,0,1,0}
  private def logged = Seq(
    (0L, 0L, 1.0), (1L, 0L, 0.0), (2L, 1L, 1.0), (3L, 1L, 0.0),
  ).toDF("query_id", "item_id", "reward")

  private def proba(p0: Double, p1: Double) = Seq(
    (0L, 0L, p0), (1L, 0L, p0), (2L, 1L, p1), (3L, 1L, p1),
  ).toDF("query_id", "item_id", "prob")

  private def behavior(b0: Double, b1: Double) =
    Seq((0L, b0), (1L, b1)).toDF("item_id", "propensity")

  private def row(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Double, Double, Double)].head()

  test("target == behavior recovers the behavior value exactly") {
    val r = row(Ope.estimate(logged, proba(0.5, 0.5), behavior(0.5, 0.5)))
    assert(r == ((4L, 0.5, 0.5, 0.5))) // w ≡ 1: every estimator = avg reward
  }

  test("one-hot target isolates that action's rounds (hand IPS/NCIS)") {
    // target plays item 0 always: w = 1/0.5 = 2 on item-0 rounds, 0 on
    // item-1 rounds → IPS = (2·1 + 2·0 + 0 + 0)/4 = 0.5,
    // NCIS = (2·1 + 2·0)/(2+2+0+0) = 0.25... wait the zero-weight rounds
    // keep w = 0 (prob 0), so Σŵ = 4 → NCIS = 2/4 = 0.5
    val r = row(Ope.estimate(logged, proba(1.0, 0.0), behavior(0.5, 0.5)))
    assert(r._1 == 4L && r._2 == 0.5)
    assert(r._3 == 0.5, s"ips ${r._3}")
    assert(r._4 == 0.5, s"ncis ${r._4}")
  }

  test("a target preferring the rewarding arm scores above behavior") {
    // item 0 pays 0.5, item 1 pays 0.5 here — build an asymmetric log
    val log2 = Seq(
      (0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 1L, 0.0), (3L, 1L, 0.0),
    ).toDF("query_id", "item_id", "reward")
    val r = row(Ope.estimate(log2, proba(0.9, 0.1), behavior(0.5, 0.5)))
    // w(item0)=1.8, w(item1)=0.2: IPS = (1.8+1.8)/4 = 0.9 > 0.5
    assert(r._2 == 0.5 && r._3 == 0.9)
    assert(r._4 == 0.9) // NCIS: 3.6/(3.6+0.4) = 0.9
  }

  test("clipping caps pathological importance weights") {
    // propensity 0.01 on item 0 → raw w = 100, clipped to 10
    val r = row(Ope.estimate(logged, proba(1.0, 0.0), behavior(0.01, 0.99),
      clip = 10.0))
    // IPS (unclipped): (100·1 + 100·0)/4 = 25 — wild overestimate
    assert(r._3 == 25.0)
    // NCIS: ŵ = 10 on item-0 rounds, 0 elsewhere → 10/(10+10) = 0.5
    assert(r._4 == 0.5)
  }

  test("value(merge(summary(A), summary(B))) == estimate(A ∪ B)") {
    val a = logged.filter($"query_id" < 2L)
    val b = logged.filter($"query_id" >= 2L)
    val p = proba(0.7, 0.3); val beh = behavior(0.4, 0.6)
    val merged = row(Ope.value(Ope.merge(
      Ope.summary(a, p, beh), Ope.summary(b, p, beh))))
    val direct = row(Ope.estimate(logged, p, beh))
    assert(merged == direct)
  }

  test("rounds without common support drop (inner-join restriction)") {
    val partial = Seq((0L, 0L, 1.0)).toDF("query_id", "item_id", "prob")
    val r = row(Ope.estimate(logged, partial, behavior(0.5, 0.5)))
    assert(r._1 == 1L)
  }

  // ---- DM / DR (Dudík, Langford & Li 2011) -------------------------------

  private def actionDist(p0: Double, p1: Double) = (0L to 3L).flatMap(q =>
    Seq((q, 0L, p0), (q, 1L, p1))).toDF("query_id", "item_id", "prob")

  private def drRow(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Double, Double, Double, Double, Double, Double)].head()

  test("DR corrects a biased reward model back to the IPS value (hand-computed)") {
    // r̂ = (0.8, 0.2) is WRONG (true per-item means are 0.5, 0.5); target
    // plays item 0 w.p. 0.8 against a uniform behavior → w = {1.6,1.6,.4,.4}.
    // DM = 0.8·0.8 + 0.2·0.2 = 0.68 (biased); the IS correction
    // (Σwr − Σw·r̂(a))/n = (2.0 − 2.72)/4 pulls DR back to exactly 0.5.
    val rm = Seq((0L, 0.8), (1L, 0.2)).toDF("item_id", "r_hat")
    val r = drRow(Ope.estimateDr(logged, proba(0.8, 0.2), behavior(0.5, 0.5),
      actionDist(0.8, 0.2), rm))
    assert(r == ((4L, 0.5, 0.5, 0.5, 0.68, 0.5, 0.5)))
  }

  test("perfect reward model + target ≡ behavior: every estimator is the behavior value") {
    val rm = Seq((0L, 0.5), (1L, 0.5)).toDF("item_id", "r_hat")
    val r = drRow(Ope.estimateDr(logged, proba(0.5, 0.5), behavior(0.5, 0.5),
      actionDist(0.5, 0.5), rm))
    assert(r == ((4L, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5)))
  }

  test("clipped DR caps the correction's weights (hand-computed)") {
    // one-hot target on a 0.05-propensity action: w = 20, clipped ŵ = 10.
    // dm = 0.3; dr = (1.2 + 20 − 12)/4 = 2.3; dr_clipped = (1.2 + 10 − 6)/4 = 1.3
    val rm = Seq((0L, 0.3), (1L, 0.9)).toDF("item_id", "r_hat")
    val r = drRow(Ope.estimateDr(logged, proba(1.0, 0.0),
      behavior(0.05, 0.95), actionDist(1.0, 0.0), rm))
    assert(r._5 == 0.3 && r._6 == 2.3 && r._7 == 1.3, r.toString)
  }

  test("actions the reward model can't score contribute r̂ = 0 (left-join contract)") {
    val rmPartial = Seq((0L, 0.8)).toDF("item_id", "r_hat")
    val r = drRow(Ope.estimateDr(logged, proba(0.8, 0.2), behavior(0.5, 0.5),
      actionDist(0.8, 0.2), rmPartial))
    // dm: only item 0 scored → q̂ = 0.64; correction: Σw·r̂(a) = 2.56 →
    // dr = (2.56 + 2.0 − 2.56)/4 = 0.5
    assert(r._5 == 0.64 && r._6 == 0.5, r.toString)
  }

  test("Ope.summary runs unchanged as a streaming policy-value monitor") {
    // the scaladoc's claim, proven: logged rounds as a 2-batch stream,
    // stream-static joins against the policy frames, complete-mode
    // running aggregate — the monitor's final row == the batch estimate
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = proba(0.7, 0.3); val beh = behavior(0.4, 0.6)
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("query_id", "item_id", "reward")
    val q = Ope.value(Ope.summary(stream, p, beh))
      .writeStream.format("memory").queryName("opemon")
      .outputMode("complete").start()
    val rows = logged.as[(Long, Long, Double)].collect().toSeq
    input.addData(rows.take(2): _*); q.processAllAvailable()
    input.addData(rows.drop(2): _*); q.processAllAvailable()
    val monitored = spark.table("opemon")
      .as[(Long, Double, Double, Double)].head()
    q.stop()
    assert(monitored == row(Ope.estimate(logged, p, beh)))
  }

  test("drValue(drMerge(drSummary(A), drSummary(B))) == estimateDr(A ∪ B)") {
    val a = logged.filter($"query_id" < 2L)
    val b = logged.filter($"query_id" >= 2L)
    val p = proba(0.7, 0.3); val beh = behavior(0.4, 0.6)
    val ad = actionDist(0.7, 0.3)
    val rm = Seq((0L, 0.6), (1L, 0.1)).toDF("item_id", "r_hat")
    val merged = drRow(Ope.drValue(Ope.drMerge(
      Ope.drSummary(a, p, beh, ad.filter($"query_id" < 2L), rm),
      Ope.drSummary(b, p, beh, ad.filter($"query_id" >= 2L), rm))))
    val direct = drRow(Ope.estimateDr(logged, p, beh, ad, rm))
    assert(merged == direct)
  }
}
