package graft.core

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Ordered-step funnel analysis over an event log — the product-analytics
  * primitive ("of the users who signed up, how many then viewed, clicked,
  * purchased within 7 days?").
  *
  * Semantics (first-touch, strictly ordered, entry-anchored window):
  *   t₁(u) = min ts of a step-1 event for u
  *   tᵢ(u) = min ts of a step-i event with tᵢ₋₁ < ts ≤ t₁ + window
  * A user reaches step i iff tᵢ exists; the step-i cohort is by
  * construction a subset of step i−1's. `window = None` disables the
  * bound (pure ordering funnel). All comparisons are on exact microsecond
  * timestamps — no floats, engine-replayable cell-for-cell.
  *
  * Scale shape: the event scan is filtered to each step's type BEFORE any
  * join (predicate reaches the parquet scan), and every join after level 1
  * is an equi-join of that filtered slice against a PER-USER frame (one
  * row per surviving user — strictly smaller each level). With s steps:
  * s filtered scans + (s−1) user-keyed equi-joins + s min-aggregations,
  * no windows, no driver state. A 100 TB event log funnels in s passes
  * each shuffling only |cohort| rows.
  */
object Funnel {

  /** Per-user funnel timeline: one row per (user, reached step) with the
    * step's first-touch timestamp. Returns
    * (userCol, step BIGINT 1-based, step_name, ts). */
  def funnelUsers(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      window: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, "funnel: duplicate step names")
    val ev = Ops.ensureTimestamp(events, tsCol)
    val first = ev.filter(F.col(typeCol) === steps.head)
      .groupBy(F.col(userCol))
      .agg(F.min(F.col(tsCol)).as("_t1"))
    var cur = first.select(F.col(userCol), F.col("_t1"),
      F.col("_t1").as("_tprev"))
    var out = cur.select(F.col(userCol), F.lit(1L).as("step"),
      F.lit(steps.head).as("step_name"), F.col("_t1").as("ts"))
    steps.zipWithIndex.drop(1).foreach { case (name, i) =>
      val slice = ev.filter(F.col(typeCol) === name)
        .select(F.col(userCol), F.col(tsCol).as("_ts"))
      val inWindow = window
        .map(w => F.col("_ts") <= F.col("_t1") + w)
        .getOrElse(F.lit(true))
      val bounded = slice.join(cur, Seq(userCol))
        .filter(F.col("_ts") > F.col("_tprev") && inWindow)
      cur = bounded.groupBy(F.col(userCol))
        .agg(F.min(F.col("_t1")).as("_t1"), F.min(F.col("_ts")).as("_tprev"))
      out = out.unionAll(cur.select(F.col(userCol),
        F.lit((i + 1).toLong).as("step"), F.lit(name).as("step_name"),
        F.col("_tprev").as("ts")))
    }
    out
  }

  /** Funnel summary: per step, the surviving-user count plus fixed-point
    * conversion rates (ppm of the step-1 cohort and of the previous step) —
    * integer division, cell-exact in any engine. Returns
    * (step, step_name, users, conv_from_entry_ppm, conv_from_prev_ppm). */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      window: Option[Column] = None): DataFrame = {
    val perUser = funnelUsers(events, userCol, typeCol, tsCol, steps, window)
    val counts = perUser.groupBy(F.col("step"), F.col("step_name"))
      .agg(F.count(F.lit(1)).as("users"))
    val entry = counts.filter(F.col("step") === 1L)
      .select(F.col("users").as("_entry"))
    val prev = counts.select((F.col("step") + 1L).as("step"),
      F.col("users").as("_prev"))
    counts.crossJoin(F.broadcast(entry))
      .join(F.broadcast(prev), Seq("step"), "left")
      .select(F.col("step"), F.col("step_name"), F.col("users"),
        F.expr("(users * 1000000) div _entry").as("conv_from_entry_ppm"),
        F.expr("(users * 1000000) div coalesce(_prev, users)")
          .as("conv_from_prev_ppm"))
  }

  /** Time-to-convert statistics per funnel step: for every user who
    * reached step i ≥ 2, the delay from their step-(i−1) first-touch;
    * aggregated to (step, step_name, n, min_us, max_us, mean_us,
    * med2_us). All integers: delays are exact microseconds, the mean is
    * `sum div n`, and the exact median of integer µs is a multiple of
    * 0.5 so it doubles back to BIGINT (`med2_us`) — the whole report
    * hash-compares across engines. One ≤|steps|-row keyed window over
    * [[funnelUsers]] + one group-sized aggregation. */
  def funnelDelays(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      window: Option[Column] = None): DataFrame = {
    val fu = funnelUsers(events, userCol, typeCol, tsCol, steps, window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(userCol)).orderBy(F.col("step").asc)
    fu.withColumn("_d_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w)))
      .filter(F.col("step") >= 2L)
      .groupBy(F.col("step"), F.col("step_name"))
      .agg(F.count(F.lit(1)).as("n"),
        F.min("_d_us").as("min_us"), F.max("_d_us").as("max_us"),
        F.expr("sum(_d_us) div count(1)").as("mean_us"),
        (F.percentile(F.col("_d_us"), F.lit(0.5)) * 2).cast("long")
          .as("med2_us"))
  }

  /** Cohort retention analysis — the other classic product-analytics
    * primitive beside the funnel: users cohort by the period of their
    * FIRST `anchorType` event; for each later period offset, the fraction
    * of the cohort with any `activityTypes` event in that period.
    *
    * All time arithmetic is exact integer microseconds: cohort =
    * `anchor_us div period_us` (epoch-aligned periods), offset =
    * `(ts_us − anchor_us) div period_us` (anchor-aligned), retention in
    * ppm by integer division — cell-exact in any engine. The anchor event
    * itself is activity at offset 0, so every cohort's offset-0 row is
    * `retention_ppm = 10⁶` by construction (a built-in sanity invariant).
    *
    * Scale shape: one filtered min-aggregation for anchors, one equi-join
    * of activity against the per-user anchor frame, one distinct on
    * (cohort, offset, user), two group-sized aggregations. No windows, no
    * driver state. Returns
    * (cohort, period_offset, active_users, cohort_size, retention_ppm). */
  def retentionCohorts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, anchorType: String, activityTypes: Seq[String],
      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, s"need periodSeconds > 0, got $periodSeconds")
    require(activityTypes.nonEmpty, "retentionCohorts: need activity types")
    val pUs = periodSeconds * 1000000L
    val ev = Ops.ensureTimestamp(events, tsCol)
    val anchors = ev.filter(F.col(typeCol) === anchorType)
      .groupBy(F.col(userCol))
      .agg(F.min(F.unix_micros(F.col(tsCol))).as("_a_us"))
      .withColumn("_cohort", F.expr(s"_a_us div ${pUs}L"))
    val cohortSizes = anchors.groupBy("_cohort")
      .agg(F.count(F.lit(1)).as("cohort_size"))
    val active = ev.filter(F.col(typeCol).isin(activityTypes: _*))
      .select(F.col(userCol), F.unix_micros(F.col(tsCol)).as("_ts_us"))
      .join(anchors, Seq(userCol))
      .filter(F.col("_ts_us") >= F.col("_a_us"))
      .select(F.col("_cohort"),
        F.expr(s"(_ts_us - _a_us) div ${pUs}L").as("period_offset"),
        F.col(userCol))
      .distinct()
      .groupBy("_cohort", "period_offset")
      .agg(F.count(F.lit(1)).as("active_users"))
    active.join(F.broadcast(cohortSizes), Seq("_cohort"))
      .select(F.col("_cohort").as("cohort"), F.col("period_offset"),
        F.col("active_users"), F.col("cohort_size"),
        F.expr("(active_users * 1000000) div cohort_size").as("retention_ppm"))
  }

  /** Frequent session paths: sessionize each user's timeline by
    * inactivity gap, render every session as its ordered event-type
    * string (`a>b>c`), and count path frequencies ≥ `minCount` — the
    * "how do users actually move through the product" view that funnels
    * (which fix the step order up front) cannot give.
    *
    * Session ids come from the classic gap rule as a per-user keyed
    * window (lag + cumulative new-session flags — O(1) state per row,
    * partitions bounded by one user's history); the path renders with an
    * ORDERED in-group sort_array fold, tie-broken by `tieCol`. Output is
    * |distinct paths| rows. Returns (path, sessions, share_ppm). */
  /** RFM segmentation (Hughes 1994 — the classic CRM customer tiering):
    * per entity, Recency (days since last activity, relative to the
    * dataset's own max timestamp — exact µs integer division), Frequency
    * (row count) and Monetary value (sum of an integral amount), each
    * scored 1..5 against the EXACT population quintiles
    * (Spark `percentile` ≡ SQL quantile_cont — the engine's proven
    * cross-engine pair): score = 1 + #{quintile boundaries strictly below
    * the value} for F/M, inverted for R (smaller recency = better), and
    * `segment = r·100 + f·10 + m` as the single sortable code.
    *
    * Scale: one groupBy to the per-entity metric frame (|entities| rows),
    * ONE percentile aggregation over it producing a 1-row boundary frame
    * (broadcast back — never collected), and a final stateless scoring
    * projection. Ties score identically in any engine (comparisons are
    * against interpolated-percentile doubles of integral metrics). */
  def rfmSegments(events0: DataFrame, entityCol: String, tsCol: String,
      amountCol: String): DataFrame = {
    val events = Ops.ensureTimestamp(events0, tsCol)
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val perEntity = events.groupBy(F.col(entityCol))
      .agg(F.max(F.unix_micros(F.col(tsCol))).as("_last"),
        F.count(F.lit(1)).as("frequency"),
        F.sum(F.col(amountCol).cast("long")).as("monetary"))
    val globalMax = perEntity.agg(F.max("_last").as("_gmax"))
    val base = perEntity.crossJoin(F.broadcast(globalMax))
      .withColumn("recency_days",
        F.expr("(_gmax - _last) div 86400000000"))
      .drop("_last", "_gmax")
    val bounds = base.agg(
      F.percentile(F.col("recency_days"), F.typedLit(qs)).as("_rq"),
      F.percentile(F.col("frequency"), F.typedLit(qs)).as("_fq"),
      F.percentile(F.col("monetary"), F.typedLit(qs)).as("_mq"))
    def score(v: Column, arr: Column, invert: Boolean): Column =
      F.lit(1L) + F.aggregate(arr, F.lit(0L),
        (acc, t) => acc + F.when(if (invert) v < t else v > t, 1L)
          .otherwise(0L))
    base.crossJoin(F.broadcast(bounds))
      .select(F.col(entityCol), F.col("recency_days"), F.col("frequency"),
        F.col("monetary"),
        score(F.col("recency_days"), F.col("_rq"), invert = true).as("r_score"),
        score(F.col("frequency"), F.col("_fq"), invert = false).as("f_score"),
        score(F.col("monetary"), F.col("_mq"), invert = false).as("m_score"))
      .withColumn("segment",
        F.col("r_score") * 100L + F.col("f_score") * 10L + F.col("m_score"))
  }

  /** Session-level engagement summary under the gap rule ([[sessionPaths]]'
    * sessionization, Sessionizer-identical): one row —
    * (sessions, bounces, bounce_ppm, events_per_session_ppm,
    * mean_duration_us) — bounce = single-event session, every cell an
    * exact integer (means as `Σ·10⁶ div n` / `Σ div n`). One keyed
    * window + a session-sized aggregation + a 1-row fold. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"need gapSeconds > 0, got $gapSeconds")
    val ev = Ops.ensureTimestamp(events, tsCol)
    val w = Window.partitionBy(F.col(userCol))
      .orderBy(F.unix_micros(F.col(tsCol)).asc, F.col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val sess = ev
      .withColumn("_us", F.unix_micros(F.col(tsCol)))
      .withColumn("_new", F.when(
        F.col("_us") - F.lag("_us", 1).over(w) >= gapUs, 1L)
        .otherwise(F.lit(0L)))
      .withColumn("_sess", F.sum("_new").over(w))
      .groupBy(F.col(userCol), F.col("_sess"))
      .agg(F.count(F.lit(1)).as("_n"),
        (F.max("_us") - F.min("_us")).as("_dur"))
    sess.agg(F.count(F.lit(1)).as("sessions"),
      F.sum(F.when(F.col("_n") === 1L, 1L).otherwise(0L)).as("bounces"),
      F.sum("_n").as("_ev"), F.sum("_dur").as("_durTot"))
      .select(F.col("sessions"), F.col("bounces"),
        F.expr("(bounces * 1000000) div sessions").as("bounce_ppm"),
        F.expr("(_ev * 1000000) div sessions").as("events_per_session_ppm"),
        F.expr("_durTot div sessions").as("mean_duration_us"))
  }

  /** Period-over-period trending: per (key, period) counts with the
    * previous period's count and the exact growth ratio
    * `cnt·10⁶ div prev` (NULL on a key's first period — no baseline).
    * The "what moved this week" feed. One groupBy + one keyed lag
    * window over the (key, period) frame — period-sized, never the
    * data. Output: (keys…, period, cnt, prev_cnt, trend_ppm). */
  def trending(events0: DataFrame, keys: Seq[String], tsCol: String,
      periodSeconds: Long = 604800L): DataFrame = {
    require(periodSeconds > 0, s"trending: periodSeconds=$periodSeconds")
    val events = Ops.ensureTimestamp(events0, tsCol)
    val pUs = periodSeconds * 1000000L
    val cnt = events
      .withColumn("period", F.expr(s"unix_micros(`$tsCol`) div ${pUs}L"))
      .groupBy((keys.map(F.col) :+ F.col("period")): _*)
      .agg(F.count(F.lit(1)).as("cnt"))
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("period"))
    cnt.withColumn("prev_cnt", F.lag(F.col("cnt"), 1).over(w))
      // a GAP period means the key went to zero and back: the ratio is
      // against the last OBSERVED period by design (documented)
      .withColumn("trend_ppm",
        F.when(F.col("prev_cnt").isNotNull,
          F.expr("(cnt * 1000000) div prev_cnt")))
  }

  /** Daily/weekly active users and stickiness: per day, DAU = distinct
    * entities that day, WAU = distinct over the trailing 7 days, and
    * `stickiness_ppm = DAU·10⁶ div WAU` (the DAU/MAU-style engagement
    * ratio, exactly). The trailing distinct is a calendar×activity range
    * join (days frame is calendar-sized) + count_distinct — never a
    * data-sized window. Output: (day, dau, wau, stickiness_ppm). */
  def activeUsers(events0: DataFrame, entityCol: String, tsCol: String,
      trailingDays: Int = 7): DataFrame = {
    require(trailingDays >= 1, s"activeUsers: trailingDays=$trailingDays")
    val events = Ops.ensureTimestamp(events0, tsCol)
    val ud = events.select(F.col(entityCol).as("_ent"),
      F.expr(s"unix_micros(`$tsCol`) div 86400000000L").as("_day"))
      .distinct()
    val dau = ud.groupBy(F.col("_day").as("day"))
      .agg(F.count(F.lit(1)).as("dau"))
    val days = ud.select(F.col("_day").as("day")).distinct()
    val wau = days.join(ud,
        F.col("_day") <= F.col("day") &&
        F.col("_day") > F.col("day") - trailingDays)
      .groupBy("day").agg(F.count_distinct(F.col("_ent")).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness_ppm", F.expr("(dau * 1000000) div wau"))
  }

  /** Multi-touch attribution over event streams: every conversion looks
    * back `windowSeconds` at the user's touchpoints (all non-conversion
    * events, channel = event type) and credits them under the THREE
    * standard models at once — first-touch, last-touch, and linear
    * (each of a conversion's k touches gets `10⁶ div k` ppm, exact
    * integer division). Output per channel:
    * (channel, touches, first_touch, last_touch, linear_ppm) where the
    * ppm column sums to ≈ conversions·10⁶ (minus div-floor leakage).
    * Touchless conversions are unattributed (absent by construction).
    *
    * Scale: one user-keyed range join (pairs bounded by the lookback
    * window — never #conversions × #touches), one window partitioned BY
    * CONVERSION (frame = that conversion's touches) for the rank/count,
    * one |channels|-sized aggregation. (ts, tie) ordering makes first/
    * last deterministic under simultaneous events. */
  def attributionCredits(events0: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      conversionType: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"attributionCredits: $windowSeconds")
    val events = Ops.ensureTimestamp(events0, tsCol)
      .select(F.col(userCol).as("_u"), F.col(typeCol).as("_type"),
        F.unix_micros(F.col(tsCol)).as("_ts"),
        F.col(tieCol).cast("long").as("_tie"))
    val wUs = windowSeconds * 1000000L
    val conv = events.filter(F.col("_type") === conversionType)
      .select(F.col("_u"), F.col("_ts").as("_cts"), F.col("_tie").as("_ctie"))
    val touch = events.filter(F.col("_type") =!= conversionType)
      .select(F.col("_u"), F.col("_type").as("channel"),
        F.col("_ts").as("_tts"), F.col("_tie").as("_ttie"))
    val pairs = conv.join(touch, Seq("_u"))
      .filter(F.col("_tts") < F.col("_cts") &&
        F.col("_tts") >= F.col("_cts") - wUs)
    val byConv = Window.partitionBy("_u", "_cts", "_ctie")
    val ordered = pairs
      .withColumn("_k", F.count(F.lit(1)).over(byConv))
      .withColumn("_rn_first", F.row_number().over(
        byConv.orderBy(F.col("_tts").asc, F.col("_ttie").asc)))
      .withColumn("_rn_last", F.row_number().over(
        byConv.orderBy(F.col("_tts").desc, F.col("_ttie").desc)))
    ordered.groupBy("channel")
      .agg(F.count(F.lit(1)).as("touches"),
        F.sum(F.when(F.col("_rn_first") === 1, 1L).otherwise(0L))
          .as("first_touch"),
        F.sum(F.when(F.col("_rn_last") === 1, 1L).otherwise(0L))
          .as("last_touch"),
        F.sum(F.expr("1000000 div _k")).as("linear_ppm"))
  }

  /** Survival-analysis hazard table (the life-table half of
    * Kaplan–Meier, kept EXACT): per distinct duration t, the at-risk
    * count (entities surviving to t), observed events and censorings at
    * t, and the discrete hazard `d_t·10⁶ div n_t` — all BIGINT (the full
    * KM curve is a cumulative PRODUCT of rationals, not integer-
    * representable; the hazard table is what it's built from and what
    * churn analysis actually reads). Input: ONE row per entity with an
    * integral duration and a 0/1 event flag (1 = event observed,
    * 0 = censored at t).
    *
    * Scale: one |durations|-sized groupBy, then the at-risk counts via
    * the DISTRIBUTED prefix sum over the grouped frame
    * (`n_t = N − (#shorter durations)`) — no global window, no driver
    * loop; output ∝ distinct durations (bucket first if unbounded).
    * Output: (t, n_at_risk, events, censored, hazard_ppm). */
  def survivalHazard(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val per = df.select(F.col(durationCol).cast("long").as("t"),
      F.col(eventCol).cast("long").as("_e"))
    val g = per.groupBy("t")
      .agg(F.count(F.lit(1)).as("_tot"), F.sum("_e").as("events"),
        (F.count(F.lit(1)) - F.sum("_e")).as("censored"))
    val total = g.agg(F.sum("_tot").as("_n"))
    Ops.globalCumsum(g, "_tot", "_cum", F.col("t"))
      .crossJoin(F.broadcast(total))
      .select(F.col("t"),
        (F.col("_n") - (F.col("_cum") - F.col("_tot"))).as("n_at_risk"),
        F.col("events"), F.col("censored"))
      .withColumn("hazard_ppm", F.expr("(events * 1000000) div n_at_risk"))
  }

  /** Cohort LTV curves: entities cohorted by the period of their FIRST
    * event (weekly by default, exact µs integer division), then each
    * (cohort, age) cell accumulates value — active entities, period
    * cents, running cumulative cents, and the per-entity cumulative
    * `cum_cents div cohort_size` (floor). The revenue twin of
    * [[retentionCohorts]]: "how much has the March cohort earned by week
    * 6". Value must be integral (cents — cast up-front).
    *
    * Scale: one per-entity first-ts aggregation, one (cohort, age)
    * groupBy, the cumulative via a window partitioned BY COHORT (frame =
    * that cohort's ages, never the data), cohort sizes broadcast back.
    * Output: (cohort_period, age_periods, users_active, cents,
    * cum_cents, cum_cents_per_user). */
  def ltvCohorts(events0: DataFrame, entityCol: String, tsCol: String,
      centsCol: String, periodSeconds: Long = 604800L): DataFrame = {
    require(periodSeconds > 0, s"ltvCohorts: periodSeconds=$periodSeconds")
    val events = Ops.ensureTimestamp(events0, tsCol)
    val pUs = periodSeconds * 1000000L
    val e = events.select(F.col(entityCol).as("_ent"),
      F.expr(s"unix_micros(`$tsCol`) div ${pUs}L").as("_p"),
      F.col(centsCol).cast("long").as("_cents"))
    val firsts = e.groupBy("_ent").agg(F.min("_p").as("cohort_period"))
    val sizes = firsts.groupBy("cohort_period")
      .agg(F.count(F.lit(1)).as("_size"))
    val cells = e.join(firsts, Seq("_ent"))
      .withColumn("age_periods", F.col("_p") - F.col("cohort_period"))
      .groupBy("cohort_period", "age_periods")
      .agg(F.count_distinct(F.col("_ent")).as("users_active"),
        F.sum("_cents").as("cents"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("cohort_period").orderBy(F.col("age_periods"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    cells.withColumn("cum_cents", F.sum("cents").over(w))
      .join(F.broadcast(sizes), Seq("cohort_period"))
      .withColumn("cum_cents_per_user",
        F.expr("cum_cents div _size"))
      .drop("_size")
  }

  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, gapSeconds: Long,
      minCount: Long = 1L): DataFrame = {
    require(gapSeconds > 0, s"need gapSeconds > 0, got $gapSeconds")
    val ev = Ops.ensureTimestamp(events, tsCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(userCol))
      .orderBy(F.unix_micros(F.col(tsCol)).asc, F.col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val sessioned = ev
      .withColumn("_us", F.unix_micros(F.col(tsCol)))
      .withColumn("_new", F.when(
        F.col("_us") - F.lag("_us", 1).over(w) >= gapUs, 1L)
        .otherwise(F.lit(0L)))
      .withColumn("_sess", F.sum("_new").over(w))
    val paths = sessioned
      .groupBy(F.col(userCol), F.col("_sess"))
      .agg(F.array_join(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_us"),
          F.col(tieCol).cast("long").as("_tie"), F.col(typeCol).as("_t")))),
        x => x.getField("_t")), ">").as("path"))
    val counts = paths.groupBy("path").agg(F.count(F.lit(1)).as("sessions"))
    val total = counts.agg(F.sum("sessions").as("_tot"))
    counts.filter(F.col("sessions") >= minCount)
      .crossJoin(F.broadcast(total))
      .select(F.col("path"), F.col("sessions"),
        F.expr("(sessions * 1000000) div _tot").as("share_ppm"))
  }
}
