package graft.core

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Declarative data-quality constraint suite (the Deequ/Great-Expectations
  * category, relationally): a pipeline states WHAT must hold —
  * completeness, uniqueness, ranges, patterns, referential integrity —
  * and gets back one verdict row per constraint:
  * (constraint, column, observed, expected, passed).
  *
  * `observed`/`expected` are fixed-point ppm BIGINTs (fractions) or raw
  * counts — every cell engine-replayable, so the whole report can be
  * hash-compared against an independent engine (and is, in the gate).
  *
  * Scale shape: all single-table constraints for one DataFrame fuse into
  * ONE aggregation pass over the data (each constraint is an O(1)-state
  * conditional count — the scan is shared, the shuffle is one row);
  * uniqueness adds one distinct-count aggregate; referential integrity is
  * one left-anti-join count against the (usually broadcastable) dimension.
  * At 100 TB the audit costs one scan plus a key-join — not one job per
  * rule.
  */
object Quality {

  sealed trait Constraint {
    def name: String
    def column: String
  }
  /** Fraction of non-null values ≥ minRatio (1.0 = NOT NULL). */
  final case class Complete(column: String, minRatioPpm: Long = 1000000L)
      extends Constraint { val name = "complete" }
  /** Column values are unique (distinct count == row count). */
  final case class Unique(column: String) extends Constraint {
    val name = "unique"
  }
  /** Fraction of values inside [lo, hi] ≥ minRatio (nulls fail the
    * predicate). */
  final case class InRange(column: String, lo: Double, hi: Double,
      minRatioPpm: Long = 1000000L) extends Constraint { val name = "in_range" }
  /** Fraction of values matching an RE2-safe regex ≥ minRatio. */
  final case class MatchesPattern(column: String, pattern: String,
      minRatioPpm: Long = 1000000L) extends Constraint { val name = "pattern" }
  /** Fraction of values in the allowed set ≥ minRatio. */
  final case class InSet(column: String, allowed: Seq[String],
      minRatioPpm: Long = 1000000L) extends Constraint { val name = "in_set" }
  /** Every value of `column` exists in `refFrame.refColumn`
    * (referential integrity; violations counted by an anti-join). */
  final case class RefersTo(column: String, refFrame: DataFrame,
      refColumn: String) extends Constraint { val name = "refers_to" }
  /** Table row count within [minRows, maxRows]. */
  final case class RowCount(minRows: Long, maxRows: Long) extends Constraint {
    val name = "row_count"; val column = "*"
  }

  /** Run the suite. One fused aggregation covers every per-row
    * constraint; Unique adds one count_distinct each; RefersTo adds one
    * anti-join count each. Returns
    * (constraint, column, observed, expected, passed) with observed =
    * ppm for ratio rules, counts for unique/refers_to/row_count. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "Quality.check: empty suite")
    val spark = df.sparkSession
    import spark.implicits._

    val perRow: Seq[(Constraint, Column)] = constraints.collect {
      case c: Complete =>
        (c, F.sum(F.when(F.col(c.column).isNotNull, 1L).otherwise(0L)))
      case c: InRange =>
        (c, F.sum(F.when(F.col(c.column) >= c.lo && F.col(c.column) <= c.hi,
          1L).otherwise(0L)))
      case c: MatchesPattern =>
        (c, F.sum(F.when(F.col(c.column).rlike(c.pattern), 1L).otherwise(0L)))
      case c: InSet =>
        (c, F.sum(F.when(
          F.col(c.column).cast("string").isin(c.allowed.map(x => x: Any): _*),
          1L).otherwise(0L)))
    }
    val uniques = constraints.collect { case c: Unique => c }
    val refs = constraints.collect { case c: RefersTo => c }
    val rowCounts = constraints.collect { case c: RowCount => c }

    val aggCols =
      (F.count(F.lit(1)).as("_total")) +:
        perRow.zipWithIndex.map { case ((_, a), i) => a.as(s"_c$i") } ++:
        uniques.zipWithIndex.map { case (c, i) =>
          F.countDistinct(F.col(c.column)).as(s"_u$i")
        }
    val one = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val total = one.getLong(one.fieldIndex("_total"))

    val rowsPerRow = perRow.zipWithIndex.map { case ((c, _), i) =>
      // conditional sums are NULL on an empty table
      val idx = one.fieldIndex(s"_c$i")
      val ok = if (one.isNullAt(idx)) 0L else one.getLong(idx)
      val ppm = if (total == 0) 1000000L else ok * 1000000L / total
      val expected = c match {
        case x: Complete => x.minRatioPpm
        case x: InRange => x.minRatioPpm
        case x: MatchesPattern => x.minRatioPpm
        case x: InSet => x.minRatioPpm
        case _ => 1000000L
      }
      (c.name, c.column, ppm, expected, ppm >= expected)
    }
    val rowsUnique = uniques.zipWithIndex.map { case (c, i) =>
      // primary-key semantics: |distinct non-null| must equal |rows| —
      // nulls or duplicates both fail
      val distinct = one.getLong(one.fieldIndex(s"_u$i"))
      (c.name, c.column, distinct, total, distinct == total)
    }
    val rowsRef = refs.map { c =>
      val missing = df.select(F.col(c.column))
        .filter(F.col(c.column).isNotNull)
        .join(c.refFrame.select(F.col(c.refColumn).as(c.column)).distinct(),
          Seq(c.column), "left_anti")
        .count()
      (c.name, c.column, missing, 0L, missing == 0L)
    }
    val rowsCount = rowCounts.map { c =>
      (c.name, c.column, total, c.minRows,
        total >= c.minRows && total <= c.maxRows)
    }

    (rowsPerRow ++ rowsUnique ++ rowsRef ++ rowsCount)
      .toDF("constraint", "column", "observed", "expected", "passed")
  }

  /** Generic one-pass column profiler — the snapshot a pipeline stores
    * per run so SCHEMA/DISTRIBUTION drift diffs are a join away: for
    * every column, null count and exact distinct count; for integral
    * columns also min/max; for strings min/max LENGTH (values may be
    * huge; lengths always compare); plus one ('*', 'rows') total. Long
    * format (col_name, metric, value) — all BIGINT, engine-exact
    * (float/timestamp min-max are deliberately omitted: their cross-
    * engine rendering is not). ONE aggregation pass over the data; the
    * multiple exact distincts expand the scan (Spark's Expand operator,
    * one duplicate per distinct) — at 100 TB swap exactness for the HLL
    * register sketch (Sketch.hllRegisters) per column instead. */
  def profile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val aggs = df.schema.fields.toSeq.flatMap { f =>
      val c = F.col(f.name)
      val base = Seq(
        F.sum(F.when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        F.count_distinct(c).as(s"${f.name}__distinct"))
      val extra = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => Seq(
          F.min(c.cast("long")).as(s"${f.name}__min"),
          F.max(c.cast("long")).as(s"${f.name}__max"))
        case StringType => Seq(
          F.min(F.length(c)).cast("long").as(s"${f.name}__min_len"),
          F.max(F.length(c)).cast("long").as(s"${f.name}__max_len"))
        case _ => Nil
      }
      base ++ extra
    } :+ F.count(F.lit(1)).as("*__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // split on the LAST "__": the metric suffix never contains "__", but a
    // source column name may (`a__b__nulls` → col `a__b`, metric `nulls`)
    val stackArgs = row.schema.fieldNames.map { fn =>
      val cut = fn.lastIndexOf("__")
      val (col0, metric) = (fn.substring(0, cut), fn.substring(cut + 2))
      s"'${col0.replace("'", "''")}', '$metric', CAST(`$fn` AS BIGINT)"
    }.mkString(", ")
    row.select(F.expr(
      s"stack(${row.schema.fieldNames.length}, $stackArgs)")
      .as(Seq("col_name", "metric", "value")))
  }

  /** Calendar-gap detection — the backfill planner's input: collapse the
    * data to its DISTINCT periods (`unix µs div unit`), lag over the
    * period order, and report every hole as
    * (gap_start, gap_end, missing_periods) where gap_start/gap_end are
    * the last present / next present period ids. The lag window runs on
    * the PERIOD frame (calendar-sized — thousands of rows for years of
    * days), never the data; the distinct is the only data-sized pass.
    * Output empty ⟺ the calendar is contiguous. */
  def dateGaps(df: DataFrame, tsCol: String,
      unitSeconds: Long = 86400L): DataFrame = {
    require(unitSeconds > 0, s"dateGaps: unitSeconds=$unitSeconds")
    val uUs = unitSeconds * 1000000L
    val periods = Ops.ensureTimestamp(df, tsCol)
      .select(F.expr(s"unix_micros(`$tsCol`) div ${uUs}L").as("_p"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy(F.col("_p"))
    periods.withColumn("_prev", F.lag(F.col("_p"), 1).over(w))
      .filter(F.col("_p") - F.col("_prev") > 1L)
      .select(F.col("_prev").as("gap_start"), F.col("_p").as("gap_end"),
        (F.col("_p") - F.col("_prev") - 1L).as("missing_periods"))
  }

  /** Benford's-law first-digit audit (Benford 1938; the classic
    * fabricated-numbers detector for naturally-scaled positive data —
    * amounts, populations, file sizes): observed leading-digit shares vs
    * the law's log₁₀(1+1/d), with the expected table HARDCODED as ppm
    * INTEGER literals (301030 = log₁₀2 · 10⁶, …) in both engines — no
    * libm log in the comparison path, so every cell hash-compares. The
    * leading digit comes from the BIGINT's decimal string (floor first;
    * integer→string is identical in any engine — float formatting is
    * not). Rows with value < 1 are excluded (no leading digit).
    * ONE 9-row aggregation; `dev_ppm` = |observed − expected|.
    * Output: (digit, n, obs_ppm, exp_ppm, dev_ppm). */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    // log10(1 + 1/d) · 1e6, rounded half-up — fixed table, both engines
    val expPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val expCol = expPpm.foldLeft(F.lit(0L)) { case (acc, (d, p)) =>
      F.when(F.col("digit") === d, p).otherwise(acc)
    }
    val counts = df
      .select(F.floor(F.col(valueCol).cast("double")).cast("long").as("_v"))
      .filter(F.col("_v") >= 1L)
      .select(F.substring(F.col("_v").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(F.count(F.lit(1)).as("n"))
    val total = counts.agg(F.sum("n").as("_tot"))
    counts.crossJoin(F.broadcast(total))
      .select(F.col("digit"), F.col("n"),
        F.expr("(n * 1000000) div _tot").as("obs_ppm"),
        expCol.as("exp_ppm"))
      .withColumn("dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")))
  }
}
