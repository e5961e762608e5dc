package graft.core

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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
}
