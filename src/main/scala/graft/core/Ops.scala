package graft.core

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Core relational operators every other module builds on.
  *
  * Semantics from the reference's spark utils (replay/utils/spark_utils.py) —
  * re-expressed as declarative Spark plans so Catalyst picks the physical
  * strategy. Every window carries a deterministic tie-break (SURVEY §7.4.1).
  */
object Ops {
  import FeatureSchema.{QueryId, ItemId, Rating}

  /** Top-k rows per partition, deterministic ties.
    * Reference: replay/utils/spark_utils.py:101-153 `get_top_k`.
    * Scale: single hash-shuffle on `partitionCols`; rank computed inside the
    * sort of each partition group — no global sort, no driver collect.
    */
  def topK(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(F.col): _*).orderBy(orderCols: _*)
    df.withColumn("_rank", F.row_number().over(w))
      .filter(F.col("_rank") <= k)
      .drop("_rank")
  }

  /** Per-query top-k recommendations ordered by rating desc, item asc
    * (the framework's central operator —
    * reference: replay/utils/spark_utils.py:146-153 `get_top_k_recs`). */
  def getTopKRecs(
      recs: DataFrame,
      k: Int,
      queryCol: String = QueryId,
      itemCol: String = ItemId,
      ratingCol: String = Rating,
  ): DataFrame =
    topK(recs, Seq(queryCol), Seq(F.col(ratingCol).desc, F.col(itemCol).asc), k)

  /** getTopKRecs twin for HUGE scored inputs (|queries| × |catalog| rows,
    * e.g. exact embedding scoring: 15k × 20k = 300M rows at sf0.1,
    * unbounded at 100 TB). The rank window must SORT the whole scored
    * stream inside each partition before WindowGroupLimit can crop — that
    * sort, not the scoring, dominates (measured 2.7 s scan vs ~60 s
    * window at sf0.1). This twin is a hash aggregation with O(k) state
    * per query (TopKList.BoundedTopK): no sort anywhere, map-side partial
    * crop for free. Same rows out, same (rating desc, item asc)
    * semantics. Requires the ObjectHashAggregate sort-fallback threshold
    * raised above the per-task group count (Session sets it to 4M) — at
    * the 128-group default Spark silently falls back to sort-based
    * aggregation, reintroducing the sort this exists to avoid.
    *
    * CONTRACT (narrower than the window twin — assert at call sites):
    *  - output is EXACTLY the 3 columns (queryCol, itemCol, ratingCol);
    *    any other input column is dropped, and items coerce to bigint /
    *    ratings to double (the engine's canonical rec types). Callers with
    *    payload columns must re-join them on (query, item) afterwards
    *    (ItemKNN does exactly this for its similarity payload).
    *  - ratings must be non-null AND non-NaN: the primitive heap has no
    *    null slot, and its `better` treats NaN as never-better — a NaN
    *    arriving at a full heap is silently dropped, and one arriving
    *    while the heap still fills slips in and corrupts the comparison
    *    order (arrival-order-dependent results) — where the window twin
    *    would deterministically rank NaN FIRST (Spark orders NaN above
    *    all doubles desc). Scoring paths that can produce NaN must clamp
    *    first (LinUCB clamps its quadratic form at 0 before sqrt);
    *    TopKBoundedSpec pins the divergence. */
  def getTopKRecsBounded(
      recs: DataFrame,
      k: Int,
      queryCol: String = QueryId,
      itemCol: String = ItemId,
      ratingCol: String = Rating,
  ): DataFrame = {
    // contract: ratings non-null (the primitive heap has no null slot; the
    // window twin would sort nulls last). Every scoring path guarantees it.
    if (k <= 0) return recs
      .select(F.col(queryCol), F.col(itemCol), F.col(ratingCol))
      .filter(F.lit(false)) // window twin's k<=0 result: empty
    recs.groupBy(queryCol)
      .agg(BoundedTopKAgg.topKPairs(k, F.col(ratingCol), F.col(itemCol)).as("_tk"))
      .select(F.col(queryCol), F.explode(F.col("_tk")).as("_p"))
      .select(F.col(queryCol), F.col("_p.item").as(itemCol), F.col("_p.rating").as(ratingCol))
  }

  /** 1-based global row_number over a TOTAL order, without the
    * single-partition `Window.orderBy` plan: range repartitioning keeps
    * partitions globally ordered, so zipWithIndex numbers rows exactly as
    * a global sort would — every partition ranks in parallel. Use for
    * entity-set-sized frames (all users, all items) where one task holding
    * the whole set is the scale hazard; `order` must be a total order
    * (include a unique tie-break column). */
  def globalRowNumber(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /** Inclusive prefix sum of `valueCol` (Long) over a TOTAL order, without
    * the single-partition `Window.orderBy` plan: range repartitioning keeps
    * partitions globally ordered; per-partition totals (one Long per
    * partition — driver-bounded by the partition count, not the data) give
    * each partition its starting offset, then every partition accumulates
    * locally in parallel. Same shape as [[globalRowNumber]]; the offsets
    * pass re-reads the range-shuffle files, not the source. `order` must be
    * a total order. */
  def globalCumsum(df: DataFrame, valueCol: String, outCol: String, order: Column*): DataFrame =
    globalCumsumWithPos(df, valueCol, outCol, None, order: _*)

  /** [[globalCumsum]] that can also emit each row's global POSITION in the
    * total order (1-based) for the same price — the offsets pass already
    * collects one record per partition, so the row counts ride along with
    * the sums. [[keyedCumsum]] needs the position to find each key's first
    * row without assuming anything about the values' signs. */
  private def globalCumsumWithPos(df: DataFrame, valueCol: String,
      outCol: String, posCol: Option[String], order: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partTotals = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; var n = 0L
      it.foreach { r => s += r.getLong(vIdx); n += 1 }
      Iterator((i, s, n))
    }.collect().sortBy(_._1)
    val sumOffsets = partTotals.map(_._2).scanLeft(0L)(_ + _)
    val posOffsets = partTotals.map(_._3).scanLeft(0L)(_ + _)
    val extra = StructField(outCol, LongType, nullable = false) +:
      posCol.map(p => StructField(p, LongType, nullable = false)).toSeq
    val schema = StructType(sorted.schema.fields ++ extra)
    sorted.sparkSession.createDataFrame(
      rdd.mapPartitionsWithIndex { case (i, it) =>
        var acc = sumOffsets(i)
        var pos = posOffsets(i)
        it.map { r =>
          acc += r.getLong(vIdx); pos += 1
          Row.fromSeq(r.toSeq ++ (acc +: (if (posCol.isDefined) Seq(pos) else Nil)))
        }
      }, schema)
  }

  /** Inclusive PER-KEY prefix sum over a per-key total order, with the
    * same no-single-partition-window guarantee as [[globalCumsum]]: a
    * keyed running total is the GLOBAL running total over (keys, order)
    * minus the global total just before the key's first row — i.e. the
    * `cum − value` of the key's FIRST row in the total order, picked with
    * `min_by` on the global position (NOT `min(cum − value)`, which only
    * equals the first-row offset when every value is non-negative; a
    * negative delta lets a later within-key prefix dip below it and would
    * silently shift the whole key). Signed values are therefore fine. One
    * [[globalCumsum]] + one key-shuffled aggregation/join; no window ever
    * holds more than a range partition, so a single key spanning half the
    * corpus (one giant source) still sums in parallel. `order` must
    * totally order rows WITHIN each key. */
  def keyedCumsum(df: DataFrame, keys: Seq[String], valueCol: String,
      outCol: String, order: Column*): DataFrame = {
    val g = globalCumsumWithPos(df, valueCol, "_gcum", Some("_gpos"),
      (keys.map(F.col) ++ order): _*)
    val offs = g.groupBy(keys.map(F.col): _*)
      .agg(F.min_by(F.col("_gcum") - F.col(valueCol), F.col("_gpos")).as("_koff"))
    g.join(offs, keys)
      .withColumn(outCol, F.col("_gcum") - F.col("_koff"))
      .drop("_gcum", "_gpos", "_koff")
  }

  /** Drop (query, item) pairs already present in history.
    * Reference: base_rec.py:152-201 `_filter_seen` — rank-crop to
    * k + max_seen BEFORE the anti-join so the join input stays bounded. */
  def filterSeen(
      recs: DataFrame,
      history: DataFrame,
      k: Int,
      queryCol: String = QueryId,
      itemCol: String = ItemId,
      ratingCol: String = Rating,
  ): DataFrame = {
    // scalar agg: largest per-user history size (one tiny job, reference
    // base_rec.py:171); null when history is empty
    val maxSeen = history.groupBy(queryCol).count()
      .agg(F.max("count")).first() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
    val cropped = topK(recs, Seq(queryCol), Seq(F.col(ratingCol).desc, F.col(itemCol).asc), k + maxSeen.toInt)
    cropped.join(history.select(queryCol, itemCol).distinct(), Seq(queryCol, itemCol), "left_anti")
  }

  /** Keep rows whose `col` appears in `reference` (cold filtering;
    * reference: preprocessing/filters.py:1131-1139 — left_semi). */
  def filterCold(df: DataFrame, reference: DataFrame, col: String): DataFrame =
    df.join(reference.select(col).distinct(), Seq(col), "left_semi")

  /** Count ids in `df` missing from `reference` (anti-join count;
    * reference: replay/utils/spark_utils.py:724-747). */
  def coldCount(df: DataFrame, reference: DataFrame, col: String): Long =
    df.select(col).distinct()
      .join(reference.select(col).distinct(), Seq(col), "left_anti")
      .count()

  /** Merge a main and a fallback rec set: fallback ratings are shifted to sit
    * strictly below the main minimum, then full-outer merge with coalesce.
    * Reference: replay/utils/spark_utils.py:480-514 `fallback`. */
  def fallbackMerge(
      main: DataFrame,
      fallback: DataFrame,
      queryCol: String = QueryId,
      itemCol: String = ItemId,
      ratingCol: String = Rating,
  ): DataFrame = {
    // shift constant as broadcast 1-row aggregates, NOT driver actions:
    // the old first()-based shift ran the main and fallback plans twice
    // (once for the scalars, once in the join); lazy scalars keep it one
    // job and let AQE reuse the aggregation exchanges. Empty fallback →
    // zero shifted rows → the merge degenerates to main, same as before.
    val mm = main.agg(
      F.coalesce(F.min(ratingCol), F.lit(0.0)).as("_main_min"))
    val fm = fallback.agg(F.max(ratingCol).as("_fb_max"))
    // shift so max(fallback) < min(main)  (reference spark_utils.py:497-503)
    val shifted = fallback
      .crossJoin(F.broadcast(fm)).crossJoin(F.broadcast(mm))
      .withColumn(ratingCol,
        F.col(ratingCol) - (F.col("_fb_max") - F.col("_main_min") + F.lit(1.0)))
      .drop("_fb_max", "_main_min")
    val m = main.select(F.col(queryCol), F.col(itemCol), F.col(ratingCol).as("_r_main"))
    val f = shifted.select(F.col(queryCol), F.col(itemCol), F.col(ratingCol).as("_r_fb"))
    m.join(f, Seq(queryCol, itemCol), "full_outer")
      .select(F.col(queryCol), F.col(itemCol),
        F.coalesce(F.col("_r_main"), F.col("_r_fb")).as(ratingCol))
  }

  /** Global min/max/mean/count/stddev of a column in one pass
    * (reference: replay/utils/spark_utils.py:394-405 `get_stats`). */
  def getStats(df: DataFrame, col: String): DataFrame =
    df.agg(
      F.min(col).as(s"min_$col"),
      F.max(col).as(s"max_$col"),
      F.avg(col).as(s"mean_$col"),
      F.count(F.col(col)).as(s"count_$col"),
      F.coalesce(F.stddev(col), F.lit(0.0)).as(s"stddev_$col"),
    )

  /** Normalize a timestamp column that may arrive as timestamp (with or
    * without timezone), numeric unix seconds, or a formatted date string
    * (reference: replay/utils/spark_utils.py:573-609). TIMESTAMP_NTZ — what
    * Spark 4 infers for parquet TIMESTAMP(MICROS) files written without the
    * UTC-adjusted flag — is cast to TimestampType, value-identical under
    * the engine's pinned UTC session timezone. */
  def processTimestampColumn(df: DataFrame, col: String, format: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(col).dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        df.withColumn(col, F.col(col).cast(TimestampType))
      case _: NumericType => df.withColumn(col, F.timestamp_seconds(F.col(col).cast(LongType)))
      case StringType =>
        format match {
          case Some(fmt) => df.withColumn(col, F.to_timestamp(F.col(col), fmt))
          case None      => df.withColumn(col, F.to_timestamp(F.col(col)))
        }
      case other => throw new IllegalArgumentException(s"cannot normalize $col of type $other")
    }
  }

  /** No-op unless `col` is TIMESTAMP_NTZ, in which case it is cast to
    * TimestampType — value-identical under the engine's pinned UTC session
    * timezone. Spark 4 infers NTZ for parquet TIMESTAMP files written
    * without the UTC-adjusted flag, and the time operators (`unix_micros`,
    * `session_window`, …) reject NTZ with DATATYPE_MISMATCH; every operator
    * consuming a caller-supplied timestamp column goes through this. */
  def ensureTimestamp(df: DataFrame, col: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(col).dataType match {
      case TimestampNTZType => df.withColumn(col, F.col(col).cast(TimestampType))
      case _                => df
    }
  }

  /** Right-size a SMALL training frame for an iterative MLlib fit
    * (KMeans & co. run one job per iteration): with `rowsPerPartition`-ish
    * rows per task the per-iteration cost is compute, not scheduling.
    * A tiny frame spread over many partitions pays iterations × partitions
    * scheduling overhead for microsecond tasks — measured 2.5× on the
    * sf0.1 PQ codebook fits after the scan fan-out. `coalesce` (never a
    * shuffle) only ever REDUCES partitions, so a genuinely large training
    * set keeps its parallelism; `n` is usually already known to callers
    * (they cache + count before iterating). */
  def compactForIterativeFit(df: DataFrame, n: Long,
      rowsPerPartition: Long = 20000): DataFrame = {
    val target = math.max(1L, math.min(df.rdd.getNumPartitions.toLong,
      (n + rowsPerPartition - 1) / rowsPerPartition)).toInt
    if (target < df.rdd.getNumPartitions) df.coalesce(target) else df
  }

  /** Expand a fixed-width array column into `prefix_{i}` scalar columns
    * (reference: replay/utils/spark_utils.py:458-462 `horizontal_explode`). */
  def horizontalExplode(df: DataFrame, arrayCol: String, width: Int, prefix: String): DataFrame = {
    val cols = (0 until width).map(i => F.col(arrayCol).getItem(i).as(s"${prefix}_$i"))
    df.select(df.columns.filterNot(_ == arrayCol).map(F.col).toSeq ++ cols: _*)
  }

  /** Distinct entities of one column (reference: spark_utils.py:750-768). */
  def getUniqueEntities(df: DataFrame, col: String): DataFrame = df.select(col).distinct()

  /** Guarded driver collect (reference: spark_utils.py:53-75
    * `spark_to_pandas` with its OOM warning): refuses to collect more than
    * `maxRows` — count first, fail fast, never OOM the driver. */
  def collectGuarded(df: DataFrame, maxRows: Long = 1000000L): Array[org.apache.spark.sql.Row] = {
    val n = df.count()
    require(n <= maxRows,
      s"refusing to collect $n rows to the driver (limit $maxRows); " +
        "write to parquet or raise the limit explicitly")
    df.collect()
  }

  /** Materialize recommendations: cache + count, or write parquet when a
    * path is given (reference: spark_utils.py:771-786 `return_recs`). */
  def returnRecs(recs: DataFrame, path: Option[String] = None): DataFrame =
    path match {
      case Some(p) =>
        recs.write.mode("overwrite").parquet(p)
        recs.sparkSession.read.parquet(p)
      case None =>
        recs.cache(); recs.count(); recs
    }

  /** Entities occurring at least `n` times (groupBy-count + semi-join back;
    * reference: preprocessing/filters.py:286-294 MinCountFilter core). */
  def minCountEntities(df: DataFrame, col: String, n: Long): DataFrame =
    df.groupBy(col).count().filter(F.col("count") >= n).select(col)

  /** Per-query weighted sampling of k items WITHOUT replacement,
    * probability proportional to rating (reference: spark_utils.py:671-721
    * `sample_top_k_recs`, done there in applyInPandas).
    *
    * Uses the exponential-sort trick: ranking by -ln(u)/w (u uniform from
    * the seeded portable hash) IS weighted sampling without replacement —
    * so the whole sampler is one expression + the standard top-k window:
    * pure Catalyst, reproducible across cluster layouts. */
  def sampleTopK(
      recs: DataFrame,
      k: Int,
      seed: Long = 42,
      queryCol: String = QueryId,
      itemCol: String = ItemId,
      ratingCol: String = Rating,
  ): DataFrame = {
    val w = Window.partitionBy(queryCol)
    val u = PortableHash.uniform(seed, F.col(queryCol), F.col(itemCol))
    val normalized = recs
      .withColumn("_p", F.col(ratingCol) / F.sum(ratingCol).over(w))
      .withColumn("_key", -F.log(u + F.lit(1e-18)) / F.col("_p"))
    topK(normalized, Seq(queryCol), Seq(F.col("_key").asc, F.col(itemCol).asc), k)
      .drop("_p", "_key")
  }

  /** Backward as-of join (point-in-time lookup): every left row picks THE
    * most recent right row of its key with rightTs ≤ leftTs (`strict`:
    * <). The matched right columns come back as `asof_<name>`, null when
    * no right row precedes.
    *
    * Spark has no ASOF operator and the naive range theta-join explodes
    * to |L|·|R| per key before filtering. This is the union-timeline
    * shape instead: both sides merge into one per-key stream sorted by
    * (ts, side-marker), and a running `last(payload, ignoreNulls)` window
    * carries the latest right payload forward onto each left row — ONE
    * shuffle on the key, O(n log n) per partition, zero pair blowup, and
    * at 100 TB it degrades exactly like any other keyed sort (AQE-split
    * skew keys notwithstanding the running-window's key partitioning).
    * Semantics match DuckDB's native ASOF LEFT JOIN, which the oracle
    * runs verbatim.
    *
    * `right` must be unique per (key, rightTs) — pre-aggregate (e.g.
    * max_by) if it isn't; with duplicates the picked row would depend on
    * sort-tie order. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("_asof")),
      "left side may not contain _asof* columns")
    // side markers order right rows BEFORE left at equal ts (inclusive
    // match) or AFTER (strict <)
    val (rm, lm) = if (strict) (1, 0) else (0, 1)
    val l = left
      .withColumn("_asof_ts", F.col(leftTs))
      .withColumn("_asof_m", F.lit(lm))
    val r = right.select(
      F.col(key), F.col(rightTs).as("_asof_ts"),
      F.struct(valueCols.map(F.col): _*).as("_asof_pay"))
      .withColumn("_asof_m", F.lit(rm))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(F.col("_asof_ts").asc, F.col("_asof_m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("_asof_match",
      F.last(F.col("_asof_pay"), ignoreNulls = true).over(w))
    matched.filter(F.col("_asof_pay").isNull)
      .select(leftCols.map(F.col) ++
        valueCols.map(c => F.col(s"_asof_match.$c").as(s"asof_$c")): _*)
  }

  /** Range (interval) join: left timestamps against right [start, end]
    * intervals of the same key, inclusive on both ends — one output row
    * per (point, covering interval). The Spark default for a range
    * predicate is a theta join (per-key |L|·|R| pairs filtered after the
    * fact — BroadcastNestedLoop or a skewed SortMerge at scale). This is
    * the standard BINNING shape instead: bin width = the longest right
    * interval (one driver-bounded scalar agg), each interval lands in ≤ 2
    * bins, each point in exactly 1, so the join is hash-equi on
    * (key, bin) with the exact range predicate as a post-filter — output
    * ∝ true matches, never the cross product. Each (point, interval)
    * pair meets on the point's single bin, so no dedup is needed.
    * Right `valueCols` must not collide with left column names. */
  def rangeJoin(left: DataFrame, right0: DataFrame, key: String, ts: String,
      startCol: String, endCol: String, valueCols: Seq[String],
      binWidthUs: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "rangeJoin needs at least one right value column")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      "right value columns must not collide with left columns")
    // pass binWidthUs when the longest interval is known; otherwise the
    // interval side is checkpointed so the span pass and the join don't
    // run its lineage twice (the left/point side is only read once)
    val right = if (binWidthUs.isDefined) right0 else right0.localCheckpoint(true)
    val binUs = binWidthUs.getOrElse {
      val span = right
        .agg(F.max(F.unix_micros(F.col(endCol)) - F.unix_micros(F.col(startCol))))
        .first()
      math.max(1L, if (span.isNullAt(0)) 1L else span.getLong(0))
    }
    require(binUs > 0, s"binWidthUs must be positive, got $binUs")
    val l = left.withColumn("_rj_bin",
      F.floor(F.unix_micros(F.col(ts)) / binUs))
    val r = right.select(
      (Seq(F.col(key),
        F.unix_micros(F.col(startCol)).as("_rj_s"),
        F.unix_micros(F.col(endCol)).as("_rj_e")) ++
        valueCols.map(F.col)): _*)
      .withColumn("_rj_bin", F.explode(F.sequence(
        F.floor(F.col("_rj_s") / binUs), F.floor(F.col("_rj_e") / binUs))))
    l.join(r, Seq(key, "_rj_bin"))
      .filter(F.unix_micros(F.col(ts)).between(F.col("_rj_s"), F.col("_rj_e")))
      .select((leftCols ++ valueCols).map(F.col): _*)
  }

  /** Interval OVERLAP join: pairs of same-key intervals [ls, le] × [rs, re]
    * with ls ≤ re ∧ rs ≤ le (inclusive overlap) — the interval×interval
    * completion of [[rangeJoin]]'s point×interval. Same binning shape: bin
    * width = the longest interval on either side, each interval explodes
    * into its covered bins, the join is hash-equi on (key, bin) with the
    * exact overlap predicate as a post-filter. A pair of overlapping
    * intervals shares ≥ 1 bin but may share several; the pair is kept
    * only in the FIRST shared bin (max of the two start-bins), so output
    * rows are unique without a distinct — output ∝ true matches + the
    * ≤ (len/width + 1) per-row bin replication, never |L|·|R| per key.
    * Right `valueCols` must not collide with left column names.
    *
    * Pass `binWidthUs` when the longest interval is known (e.g. sessions
    * gap-capped at 30 min) to skip the span aggregations entirely;
    * otherwise both inputs are eagerly localCheckpoint'ed so the span
    * pass and the join read materialized blocks instead of running each
    * input's lineage twice. */
  def intervalJoin(left0: DataFrame, right0: DataFrame, key: String,
      leftStart: String, leftEnd: String, rightStart: String,
      rightEnd: String, valueCols: Seq[String],
      binWidthUs: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "intervalJoin needs at least one right value column")
    val leftCols = left0.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      "right value columns must not collide with left columns")
    val (left, right) = binWidthUs match {
      case Some(_) => (left0, right0)
      case None    => (left0.localCheckpoint(true), right0.localCheckpoint(true))
    }
    def spanOf(df: DataFrame, s: String, e: String): Long = {
      val r = df.agg(
        F.max(F.unix_micros(F.col(e)) - F.unix_micros(F.col(s)))).first()
      if (r.isNullAt(0)) 1L else math.max(1L, r.getLong(0))
    }
    val binUs = binWidthUs.getOrElse(math.max(
      spanOf(left, leftStart, leftEnd), spanOf(right, rightStart, rightEnd)))
    require(binUs > 0, s"binWidthUs must be positive, got $binUs")
    val l = left
      .withColumn("_ij_ls", F.unix_micros(F.col(leftStart)))
      .withColumn("_ij_le", F.unix_micros(F.col(leftEnd)))
      .withColumn("_ij_bin", F.explode(F.sequence(
        F.floor(F.col("_ij_ls") / binUs), F.floor(F.col("_ij_le") / binUs))))
    val r = right.select(
      (Seq(F.col(key),
        F.unix_micros(F.col(rightStart)).as("_ij_rs"),
        F.unix_micros(F.col(rightEnd)).as("_ij_re")) ++
        valueCols.map(F.col)): _*)
      .withColumn("_ij_bin", F.explode(F.sequence(
        F.floor(F.col("_ij_rs") / binUs), F.floor(F.col("_ij_re") / binUs))))
    l.join(r, Seq(key, "_ij_bin"))
      .filter(F.col("_ij_ls") <= F.col("_ij_re") &&
        F.col("_ij_rs") <= F.col("_ij_le"))
      // first shared bin = max of the two start bins — dedups multi-bin pairs
      .filter(F.col("_ij_bin") === F.greatest(
        F.floor(F.col("_ij_ls") / binUs), F.floor(F.col("_ij_rs") / binUs)))
      .select((leftCols ++ valueCols).map(F.col): _*)
  }

  /** Skew-salted equi-join: result-identical to `left.join(right, keys,
    * joinType)` but no single reducer ever holds one hot key's whole left
    * side. The left (big, skewed) side gets a deterministic per-row salt
    * in [0, nSalts) hashed from `saltBy` (any column(s) that vary within a
    * key — an event id, a timestamp); the right side is replicated nSalts×
    * with every salt value, so each (key, salt) bucket still sees the full
    * right rows for its key and the join stays exact. Hot keys spread over
    * nSalts reducers at the price of an nSalts× right-side replication —
    * the classic salting trade, worth it when |right per key| ≪ |left per
    * key| (dimension lookups, per-entity aggregates).
    *
    * Only left-preserving join types are legal: an unmatched LEFT row
    * appears once (its single salt bucket), but an unmatched RIGHT row
    * exists in all nSalts replicas — right/full outer would emit it
    * nSalts times. AQE's skew-join split solves the same problem
    * opportunistically at runtime; this is the declarative form for when
    * the skew is known (and it composes with AQE on the residual salt
    * buckets). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBy: Seq[Column], nSalts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"need nSalts >= 1, got $nSalts")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin preserves only the LEFT side; '$joinType' would emit " +
        s"unmatched right rows once per salt replica")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs may not contain a _salt column")
    val l = left.withColumn("_salt",
      F.pmod(F.xxhash64(saltBy: _*), F.lit(nSalts.toLong)))
    val r = right.withColumn("_salt",
      F.explode(F.sequence(F.lit(0L), F.lit(nSalts - 1L))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** CDC merge: apply a change feed (upserts + deletes) to a base
    * snapshot and return the new snapshot. `changes` carries the base
    * schema plus `opCol` ("upsert" | "delete") and `orderCol` (a version /
    * commit sequence; (keys, orderCol) must be unique — pre-aggregate a
    * feed that can carry two changes of one key at one version). Per key
    * the LATEST change wins: a final upsert replaces (or inserts) the
    * row, a final delete removes it; keys without changes pass through.
    *
    * Scale: one keyed shuffle to pick each key's last change (the O(k)
    * per-group window, k=1), one anti-join of base against the changed
    * key set, one union — the merge-into shape, no driver state. Output
    * schema = base schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      orderCol: String, opCol: String = "op"): DataFrame = {
    val baseCols = base.columns.toSeq
    require(keys.forall(baseCols.contains),
      s"keys ${keys.mkString(",")} must exist in base")
    require(changes.columns.contains(opCol) && changes.columns.contains(orderCol),
      s"changes needs '$opCol' and '$orderCol' columns")
    val latest = topK(changes, keys,
      Seq(F.col(orderCol).desc, F.col(opCol).asc), 1)
      // a malformed op would otherwise act as a silent delete (the key is
      // anti-joined out of base but nothing re-adds it): fail loudly
      // per-row. assert_true returns NULL on pass, so the isNull filter
      // keeps every row while forcing the check to run (and survive
      // column pruning).
      .filter(F.assert_true(F.col(opCol).isin("upsert", "delete"),
        F.concat(F.lit(s"applyChanges: '$opCol' must be 'upsert' or " +
          "'delete', got '"), F.col(opCol), F.lit("'"))).isNull)
    base.join(latest.select(keys.map(F.col): _*), keys, "left_anti")
      .unionByName(latest.filter(F.col(opCol) === "upsert")
        .select(baseCols.map(F.col): _*))
  }

  /** Corpus-relative percentile rank in [0, 1] over a TOTAL order —
    * SQL `percent_rank()` ((rank−1)/(n−1), 0 when n=1) without the
    * single-partition global window: ranks via [[globalRowNumber]]
    * (range shuffle + zipWithIndex), n via one scalar aggregate. `order`
    * must be total (include a unique tie-break); with a total order
    * row_number ≡ rank, so the result matches `percent_rank()` over the
    * same ORDER BY exactly. The standard corpus-relative normalization
    * for quality scores (select "top 30% by quality" without knowing the
    * score scale). */
  def percentileRank(df: DataFrame, outCol: String, order: Column*): DataFrame = {
    val n = df.count()
    val ranked = globalRowNumber(df, "_pr", order: _*)
    val out =
      if (n <= 1L) ranked.withColumn(outCol, F.lit(0.0))
      else ranked.withColumn(outCol,
        (F.col("_pr") - 1L).cast("double") / F.lit((n - 1).toDouble))
    out.drop("_pr")
  }

  /** Inverse of [[applyChanges]]: diff two snapshots of a keyed table into
    * the minimal CDC feed that replays one into the other —
    * `applyChanges(base, changesBetween(base, next), keys, "version")`
    * equals `next` exactly (spec'd as a law). Emits one row per changed
    * key: op = "upsert" for keys added or whose non-key payload differs
    * (payload = next's row), "delete" for keys that vanished; unchanged
    * keys emit nothing. All versions are 1 — a single-snapshot diff is
    * one atomic commit.
    *
    * Scale: ONE full outer join on the keys with a struct-equality
    * filter; output ∝ churn, not table size. The struct comparison is
    * null-safe (`<=>`), so NULL payload cells compare as equal to NULL. */
  def changesBetween(base: DataFrame, next: DataFrame, keys: Seq[String],
      opCol: String = "op", versionCol: String = "version"): DataFrame = {
    require(base.columns.toSeq == next.columns.toSeq,
      s"snapshots must share a schema: ${base.columns.mkString(",")} vs " +
        next.columns.mkString(","))
    val payload = base.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, side: String): DataFrame = df.select(
      (keys.map(F.col) :+
        F.struct(payload.map(F.col): _*).as(s"_pay_$side")) ++
        Seq(F.lit(true).as(s"_in_$side")): _*)
    val joined = packed(base, "b").join(packed(next, "n"), keys, "full_outer")
    val added = F.col("_in_b").isNull
    val removed = F.col("_in_n").isNull
    val altered = F.col("_in_b").isNotNull && F.col("_in_n").isNotNull &&
      !(F.col("_pay_b") <=> F.col("_pay_n"))
    joined.filter(added || removed || altered)
      .select((keys.map(F.col) ++
        payload.map(c => F.when(removed, F.col(s"_pay_b.$c"))
          .otherwise(F.col(s"_pay_n.$c")).as(c)) ++
        Seq(F.when(removed, F.lit("delete")).otherwise(F.lit("upsert"))
          .as(opCol),
          F.lit(1L).as(versionCol))): _*)
  }

  /** Deterministic corpus shuffle for training-order randomization: every
    * row gets a stable (shard, pos) — `shard` = portable-hash(seed, id) mod
    * nShards, `pos` = the row's 1-based rank within its shard under the
    * hash order. Same (seed, ids) → byte-identical epoch order on any
    * cluster layout, any partitioning, any engine (the md5 chain is the
    * DuckDB-mirrorable one used by every sampler gate); a new seed is a
    * fresh epoch permutation. Dataloaders read shard s in pos order.
    *
    * Scale: ranks come from ONE range shuffle on (shard, hash, id) via
    * [[globalRowNumber]] (no single-partition window — a shard can span
    * the corpus), then each shard's offset is subtracted via an
    * nShards-row broadcast join. `idCols` must uniquely identify rows
    * (they tie-break equal hashes). */
  def deterministicShuffle(df: DataFrame, idCols: Seq[String], seed: Long,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    require(Seq("_dsh", "_dsrank", "shard", "pos").forall(!df.columns.contains(_)),
      "input may not contain _dsh/_dsrank/shard/pos columns")
    val hashed = df
      .withColumn("_dsh", PortableHash.long(seed, idCols.map(F.col): _*))
      .withColumn("shard", F.pmod(F.col("_dsh"), F.lit(nShards.toLong)))
    val ranked = globalRowNumber(hashed, "_dsrank",
      (Seq(F.col("shard").asc, F.col("_dsh").asc) ++
        idCols.map(F.col(_).asc)): _*)
    val offsets = ranked.groupBy("shard")
      .agg(F.min(F.col("_dsrank")).as("_dsoff"))
    ranked.join(F.broadcast(offsets), Seq("shard"))
      .withColumn("pos", F.col("_dsrank") - F.col("_dsoff") + 1L)
      .drop("_dsh", "_dsrank", "_dsoff")
  }

  /** Size-targeted compacting parquet writer — the small-files/giant-files
    * answer at 100 TB (a 1000-executor job writing one file per reduce
    * task produces millions of KB files; a coalesce(1) produces one
    * unsplittable monster). Partition count = ceil(estimated on-disk
    * bytes / targetFileBytes), estimated from the optimized plan's
    * sizeInBytes × `compressionRatio` (in-memory → parquet-on-disk;
    * ~0.3 for text-heavy tables, tune per corpus). With `sortCols` the
    * data is RANGE-partitioned and sorted within files, so each file
    * covers a disjoint key range and min/max footer stats prune whole
    * files on that key (zone-map layout); without, a plain round-robin
    * repartition balances bytes. Returns the file count written. */
  def writeCompacted(df: DataFrame, path: String, targetFileBytes: Long = 128L << 20,
      sortCols: Seq[Column] = Nil, compressionRatio: Double = 0.3,
      fallbackBytesPerRow: Long = 128L, maxFiles: Int = 1 << 18): Int = {
    val nFiles = targetPartitions(df, targetFileBytes, compressionRatio,
      fallbackBytesPerRow, maxFiles)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols: _*).sortWithinPartitions(sortCols: _*)
      else df.repartition(nFiles)
    shaped.write.mode("overwrite").parquet(path)
    nFiles
  }

  /** Byte-targeted partition count for the compacting writers. */
  private def targetPartitions(df: DataFrame, targetFileBytes: Long,
      compressionRatio: Double, fallbackBytesPerRow: Long, maxFiles: Int): Int = {
    require(targetFileBytes > 0, s"need targetFileBytes > 0: $targetFileBytes")
    require(compressionRatio > 0, s"need compressionRatio > 0: $compressionRatio")
    // RDD-backed lineages (globalRowNumber, deterministicShuffle, ...) have
    // no stats — sizeInBytes falls back to spark.sql.defaultSizeInBytes
    // (Long.MaxValue), which would plan Int.MaxValue partitions. Detect the
    // sentinel and estimate from the row count instead; clamp regardless.
    val rawStats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estBytes =
      if (rawStats < BigInt(Long.MaxValue) / 4) rawStats.toDouble * compressionRatio
      else df.count().toDouble * fallbackBytesPerRow
    math.min(maxFiles.toLong,
      math.max(1L, math.ceil(estBytes / targetFileBytes).toLong)).toInt
  }

  /** Z-order (Morton) interleave of `cols.size` coordinates already scaled
    * into [0, 2^bits): bit b of coordinate i lands at output bit
    * b·k + i. Pure shift/and/or — one codegen'd expression, no UDF. The
    * multi-dimensional clustering key behind lakehouse Z-ORDER layouts:
    * range-partitioning on it keeps rows close in EVERY interleaved
    * dimension close on disk, so parquet min/max footer stats prune files
    * for predicates on ANY of the dimensions (a plain sort only prunes
    * its leading column). */
  def zOrderValue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty, "zOrderValue: need at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"zOrderValue: ${cols.size} cols x $bits bits exceeds the 63-bit budget")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield F.shiftleft(
      F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1L)),
      b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max scale integral columns to [0, 2^bits) and attach their
    * Z-order key: scaled_i = ((v_i − min_i) · (2^bits − 1)) div
    * (max_i − min_i) — EXACT integer arithmetic (a SQL engine replays it
    * with `//`), constant columns scale to 0. Bounds come from one
    * aggregation collected as 2·k driver scalars (bounded contract, like
    * [[graft.core.Sketch.bounds]]); they also guard the overflow budget
    * (range · mask must stay below 2^63). Fractional inputs should be
    * pre-quantized by the caller — the cast truncates. */
  def zOrderKey(df: DataFrame, zCols: Seq[String], bits: Int = 21,
      outCol: String = "zvalue"): DataFrame = {
    require(zCols.nonEmpty, "zOrderKey: need at least one column")
    require(!df.columns.contains(outCol), s"input already has column $outCol")
    val mask = (1L << bits) - 1L
    val boundsExprs = zCols.flatMap(c =>
      Seq(F.min(F.col(c).cast("long")), F.max(F.col(c).cast("long"))))
    val boundsRow = df.agg(boundsExprs.head, boundsExprs.tail: _*).first()
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      require(!boundsRow.isNullAt(2 * i) && !boundsRow.isNullAt(2 * i + 1),
        s"zOrderKey($c): column has no non-null rows")
      val (lo, hi) = (boundsRow.getLong(2 * i), boundsRow.getLong(2 * i + 1))
      val range = hi - lo
      require(range <= Long.MaxValue / (mask max 1L),
        s"zOrderKey($c): range $range x $bits bits overflows 63 bits")
      if (range == 0L) F.lit(0L)
      else F.expr(s"((CAST(`$c` AS BIGINT) - ${lo}L) * ${mask}L) div ${range}L")
    }
    df.withColumn(outCol, zOrderValue(scaled, bits))
  }

  /** Z-ordered compacting parquet writer: [[zOrderKey]] + range
    * partition + in-file sort on the Morton key, key dropped before
    * write. Each output file then covers a compact multi-dimensional
    * cell, so footer min/max stats on the ORIGINAL columns prune files
    * for predicates on any zCol — the layout move that turns a 100 TB
    * full scan into a few-file read for point/range lookups on either
    * dimension. Returns the file count. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 21, targetFileBytes: Long = 128L << 20,
      compressionRatio: Double = 0.3, fallbackBytesPerRow: Long = 128L,
      maxFiles: Int = 1 << 18): Int = {
    val nFiles = targetPartitions(df, targetFileBytes, compressionRatio,
      fallbackBytesPerRow, maxFiles)
    zOrderKey(df, zCols, bits, outCol = "_zmorton")
      .repartitionByRange(nFiles, F.col("_zmorton"))
      .sortWithinPartitions(F.col("_zmorton"))
      .drop("_zmorton")
      .write.mode("overwrite").parquet(path)
    nFiles
  }

  /** Slowly-changing-dimension TYPE 2 history from a CDC change feed —
    * the third leg of the engine's CDC algebra ([[applyChanges]] = Type-1
    * merge, [[changesBetween]] = snapshot diff). Each `upsert` opens a
    * validity interval `[version, next-change-version)`; the key's NEXT
    * change of EITHER op closes it (a delete closes without opening), so
    * `valid_to IS NULL` marks the current row. Law (spec'd):
    * `scdSnapshotAt(scdType2(feed), v)` ≡ `applyChanges(∅, feed ≤ v)` for
    * every version v — the history table and the merge replay agree at
    * every point in time.
    *
    * `(keys, version)` must be unique — two changes at one key+version
    * have no defined order in a history table; enforced per-row
    * (assert_true), as is the op vocabulary.
    *
    * Scale: ONE window over the feed partitioned by key (the feed is
    * churn-sized, not table-sized) — no join against the base table at
    * all; output ∝ #upserts. */
  def scdType2(changes: DataFrame, keys: Seq[String], versionCol: String,
      opCol: String = "op"): DataFrame = {
    require(changes.columns.contains(opCol) && changes.columns.contains(versionCol),
      s"changes needs '$opCol' and '$versionCol' columns")
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col(versionCol).asc, F.col(opCol).asc)
    val dup = Window.partitionBy((keys :+ versionCol).map(F.col): _*)
    changes
      .withColumn("_vdup", F.count(F.lit(1)).over(dup))
      .filter(F.assert_true(F.col("_vdup") === 1L,
        F.lit(s"scdType2: duplicate ($versionCol) within a key — history " +
          "order undefined")).isNull)
      .filter(F.assert_true(F.col(opCol).isin("upsert", "delete"),
        F.concat(F.lit(s"scdType2: '$opCol' must be 'upsert' or 'delete', " +
          "got '"), F.col(opCol), F.lit("'"))).isNull)
      .withColumn("valid_to", F.lead(F.col(versionCol), 1).over(w))
      .filter(F.col(opCol) === "upsert")
      .withColumn("valid_from", F.col(versionCol))
      .withColumn("is_current", F.col("valid_to").isNull)
      .drop("_vdup", opCol, versionCol)
  }

  /** Point-in-time snapshot of a [[scdType2]] history: the payload rows
    * whose interval covers `version` (`valid_from <= v < valid_to`, open
    * intervals count). Pure filter — partition-pruned for free when the
    * history is stored partitioned/sorted on `valid_from`. */
  def scdSnapshotAt(history: DataFrame, version: Long): DataFrame =
    history.filter(F.col("valid_from") <= version &&
        (F.col("valid_to").isNull || F.col("valid_to") > version))
      .drop("valid_from", "valid_to", "is_current")

  /** Point-in-time enrichment against a [[scdType2]] history: every fact
    * row picks the dimension attributes valid AT ITS OWN version
    * (`valid_from ≤ at < valid_to`, NULL-open current rows) — the
    * per-row generalization of [[scdSnapshotAt]] and the standard
    * "training features must be as-of the event, not as-of today"
    * leakage guard. LEFT join: facts before the key's first change (or
    * with no history at all) keep NULL attributes. The join condition is
    * equi on the keys with the interval as a residual filter, so the
    * plan is an ordinary key join (broadcast/sort-merge), never a
    * cartesian — at most ONE history row matches per fact by the SCD2
    * interval disjointness invariant. `atCol` must be a facts column in
    * the history's version units. */
  def scd2Lookup(facts: DataFrame, history0: DataFrame, keys: Seq[String],
      atCol: String): DataFrame = {
    val h = history0.drop("is_current")
    val cond = keys.map(k => facts(k) === h(k)).reduce(_ && _) &&
      facts(atCol) >= h("valid_from") &&
      (h("valid_to").isNull || facts(atCol) < h("valid_to"))
    keys.foldLeft(facts.join(h, cond, "left"))((df, k) => df.drop(h(k)))
      .drop("valid_from", "valid_to")
  }

  /** Per-group exact min-max scaling to ppm: `(x − min)·10⁶ div
    * (max − min)`, NULL for constant groups (zero range carries no
    * information — emitting 0 or 10⁶ would be an arbitrary choice
    * downstream models silently learn). Integral values; one group-sized
    * aggregation joined back on the group key. Adds `scaled_ppm`. */
  def minMaxScale(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val v = F.col(valueCol).cast("long")
    val b = df.groupBy(keys.map(F.col): _*)
      .agg(F.min(v).as("_mn"), F.max(v).as("_mx"))
    df.join(b, keys)
      .withColumn("scaled_ppm",
        F.when(F.col("_mx") > F.col("_mn"), F.expr(
          s"((CAST($valueCol AS BIGINT) - _mn) * 1000000) div (_mx - _mn)")))
      .drop("_mn", "_mx")
  }

  /** Trailing event-time rolling aggregates per key: for every row, the
    * COUNT and exact integer SUM of `valueCol` over that key's rows in
    * `[ts − windowSeconds, ts]` (inclusive both ends; simultaneous rows
    * are RANGE-frame peers and always aggregate together, so the result
    * is deterministic under timestamp ties). The "activity in the last
    * N hours" feature shape.
    *
    * The sum is computed in cents (`round(value·100)` BIGINT) — an exact,
    * order-independent integer both engines agree on, where a sliding
    * double sum is summation-order-sensitive at the ulp level.
    *
    * Scale: ONE hash shuffle on `keys` + per-partition sort; Spark
    * evaluates the RANGE frame with a sliding two-pointer over each
    * key's sorted rows — state is bounded by the frame width, never the
    * partition, and there is no self-join (the naive formulation would be
    * |rows|·|frame| pairs). */
  def rollingTimeAgg(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, windowSeconds: Long,
      cntCol: String = "roll_cnt", sumCol: String = "roll_sum_cents"): DataFrame = {
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.unix_micros(F.col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    df.withColumn(cntCol, F.count(F.lit(1)).over(w))
      .withColumn(sumCol,
        F.sum(F.round(F.col(valueCol) * 100).cast("long")).over(w))
  }

  /** Mergeable per-key aggregate state: (keys..., cnt, sum, min, max) over
    * a BIGINT measure column. This is the partial-aggregation algebra made
    * into a TABLE, so a pre-aggregated summary can be maintained
    * incrementally: summarize only the new data and [[aggMerge]] it into
    * yesterday's summary — at 100 TB the history is never re-scanned, the
    * daily cost is O(delta) + one summary-sized merge join. The measure
    * must already be an exact integer (cents, micros, counts — the
    * engine's usual fixed-point convention) so every state cell is
    * engine-replayable; a float sum would make merged-vs-recomputed
    * equality itself ill-defined. */
  def aggSummary(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("cnt"),
        F.sum(F.col(valueCol).cast("long")).as("sum"),
        F.min(F.col(valueCol).cast("long")).as("min"),
        F.max(F.col(valueCol).cast("long")).as("max"))

  /** Merge two [[aggSummary]] states: cnt/sum add, min/max combine —
    * `aggMerge(aggSummary(A), aggSummary(B)) ≡ aggSummary(A ∪ B)`
    * key-for-key, cell-for-cell (the law the gate checks). Union +
    * re-aggregate rather than a full-outer join: same result, one shuffle,
    * and it generalizes to n-way merges for free. */
  def aggMerge(summaries: DataFrame*): DataFrame = {
    require(summaries.nonEmpty, "aggMerge: need at least one summary")
    val keys = summaries.head.columns.filterNot(
      Set("cnt", "sum", "min", "max")).toSeq
    summaries.reduce(_ unionAll _)
      .groupBy(keys.map(F.col): _*)
      .agg(F.sum("cnt").as("cnt"), F.sum("sum").as("sum"),
        F.min("min").as("min"), F.max("max").as("max"))
  }

  /** Incremental JOIN maintenance (the join-side twin of
    * [[aggSummary]]/[[aggMerge]]): the DELTA of an inner equi-join under
    * insert-only updates,
    *
    *   Δ(A ⋈ B) = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * — the classic incremental-view-maintenance identity. Appending the
    * result to yesterday's materialized join reproduces
    * `(A_old ∪ ΔA) ⋈ (B_old ∪ ΔB)` exactly (multiset semantics; the law
    * the gate checks), but the two big snapshots never join each other:
    * at 100 TB the daily cost is two delta-sized shuffles against the
    * snapshots plus one delta×delta join, instead of re-joining the
    * whole history. Insert-only by contract — deletes/updates route
    * through [[applyChanges]]' CDC path first, then a rebuild of the
    * affected keys. Column layout: key columns, then A's payload, then
    * B's payload (the same layout `oldA.join(oldB, keys)` produces). */
  def deltaJoinMaintain(oldA: DataFrame, deltaA: DataFrame,
      oldB: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "deltaJoinMaintain: need join keys")
    deltaA.join(oldB, keys)
      .unionByName(oldA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
  }

  /** k-anonymity audit (Sweeney 2002) over a quasi-identifier column set:
    * one row per observed quasi-identifier combination with its occupancy
    * and the `anonymous = n ≥ k` verdict. A combination shared by fewer
    * than k rows re-identifies its members by linkage — the audit is the
    * gate a privacy-scrubbing pipeline (cf. TextStats.redactPii) runs
    * before release. ONE partial+final groupBy; output is bounded by the
    * number of distinct combinations, never the row count. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: need quasi columns")
    require(k >= 1, s"kAnonymityAudit: need k >= 1, got $k")
    df.groupBy(quasiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"))
      .withColumn("anonymous", F.col("n") >= k)
  }

  /** Bloom-prefiltered semi-join: build an m-bit Bloom filter from the
    * SMALL side's keys (one O(m)-cell aggregation), broadcast it, and cut
    * the big side down to the "maybe present" slice BEFORE the exact
    * semi-join. Result-identical to `big.join(small, keys, "left_semi")`
    * — no false negatives ever — but at 100 TB the exact join's shuffle
    * carries only matches + the fpr-sized noise slice instead of the
    * whole fact table (the Bloom trio's §"pre-filter ahead of an exact
    * anti-join" story, packaged as the join operator itself; Spark's own
    * runtime row-group filters don't survive a non-broadcastable small
    * side, this does — m bits vs the key set). */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 26),
      s"bloomSemiJoin: numBits must be a multiple of 64 in [64, 2^26], got $numBits")
    // driver state: numBits BITS (128 KiB at the 2^20 default, 8 MiB at
    // the 2^26 cap) — an explicit bounded-collect contract like SLIM's
    // CSC / HnswAnn's maxCollect
    val words = new Array[Long]((numBits + 63) / 64)
    Sketch.bloomBits(small.select(key), key, numBits, numHashes)
      .filter(F.col("is_set") === 1L).select("bit")
      .collect().foreach { r =>
        val b = r.getLong(0)
        words((b >> 6).toInt) |= (1L << (b & 63L))
      }
    val mask = F.lit(words)
    // row-wise probe in whole-stage codegen: NO shuffle touches the big
    // side until the exact semi-join over the surviving slice
    val pass = F.forall(Sketch.bloomPositions(key, numBits, numHashes),
      p => (F.call_function("shiftrightunsigned",
        F.element_at(mask, (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(F.lit(1L))) === 1L)
    big.filter(pass).join(small.select(key).distinct(), Seq(key), "left_semi")
  }

  /** Deterministic per-key rate limiting: keep at most `maxPerWindow`
    * events per (key, tumbling window), picked by (ts, tie) order — the
    * ingestion-throttling shape (bot damping, per-device caps,
    * fairness-bounded sampling) as a pure relational op. ONE keyed window
    * (partitions bounded by a key's events in one window), rank ≤ n kept.
    * Window start is epoch-aligned: `ts_us div windowUs`. */
  def rateLimit(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, windowSeconds: Long, maxPerWindow: Int): DataFrame = {
    require(windowSeconds > 0 && maxPerWindow > 0,
      s"rateLimit: windowSeconds=$windowSeconds maxPerWindow=$maxPerWindow")
    val wUs = windowSeconds * 1000000L
    val withWin = ensureTimestamp(df, tsCol)
      .withColumn("_win", F.expr(s"unix_micros($tsCol) div ${wUs}L"))
    val w = Window.partitionBy((keys.map(F.col) :+ F.col("_win")): _*)
      .orderBy(F.unix_micros(F.col(tsCol)).asc, F.col(tieCol).asc)
    withWin.withColumn("_rk", F.row_number().over(w))
      .filter(F.col("_rk") <= maxPerWindow)
      .drop("_rk", "_win")
  }

  /** Winsorization: clamp a column into its own [lo, hi] exact quantile
    * range — the standard heavy-tail taming step before means/regressions
    * (cap, don't drop, so volumes are preserved). Quantiles are Spark's
    * exact interpolated percentile per group (or globally with
    * `keys = Nil`); on integer measures every bound is an exact multiple
    * of 0.5, so the clamped values are engine-exact. Two group-sized
    * aggregates + one join — no data-sized windows. Adds `<valueCol>_w`
    * (clamped, double) plus the bounds. */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, s"winsorize: ($loQ, $hiQ)")
    val bounds =
      if (keys.isEmpty)
        df.agg(F.percentile(F.col(valueCol), F.lit(loQ)).as("_lo"),
          F.percentile(F.col(valueCol), F.lit(hiQ)).as("_hi"))
      else
        df.groupBy(keys.map(F.col): _*)
          .agg(F.percentile(F.col(valueCol), F.lit(loQ)).as("_lo"),
            F.percentile(F.col(valueCol), F.lit(hiQ)).as("_hi"))
    val joined = if (keys.isEmpty) df.crossJoin(F.broadcast(bounds))
      else df.join(bounds, keys)
    joined.withColumn(s"${valueCol}_w",
      F.least(F.greatest(F.col(valueCol).cast("double"), F.col("_lo")),
        F.col("_hi")))
      .withColumnRenamed("_lo", "w_lo").withColumnRenamed("_hi", "w_hi")
  }

  /** Per-group ordinary least squares as EXACT integer sufficient
    * statistics: for integer (x, y), the slope is the rational
    * `num/den = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` — emitted raw plus as
    * fixed-point `slope_ppm = (10⁶·num) div den`. One partial+final
    * groupBy of five O(1) accumulators; no solver, no floats, cell-exact
    * in any engine. The "per-item price trend over time" shape at
    * catalog scale.
    *
    * Overflow contract: |n·Σxy| < 2⁶³ — offset x to small magnitudes
    * (days since the window start, not epoch seconds) and keep y in
    * sane fixed-point units; degenerate groups (constant x → den 0)
    * return NULL slope. */
  def groupLinearFit(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val g = df.select((keys.map(F.col) :+ F.col(xCol).cast("long").as("_x")
      :+ F.col(yCol).cast("long").as("_y")): _*)
      .groupBy(keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"), F.sum("_x").as("_sx"),
        F.sum("_y").as("_sy"), F.sum(F.expr("_x * _y")).as("_sxy"),
        F.sum(F.expr("_x * _x")).as("_sxx"))
    g.select((keys.map(F.col) :+ F.col("n") :+
      F.expr("n * _sxy - _sx * _sy").as("num") :+
      F.expr("n * _sxx - _sx * _sx").as("den") :+
      F.expr("CASE WHEN n * _sxx - _sx * _sx = 0 THEN NULL " +
        "ELSE (1000000 * (n * _sxy - _sx * _sy)) div (n * _sxx - _sx * _sx) " +
        "END").as("slope_ppm")): _*)
  }

  /** CUSUM drift detection per key (Page 1954), fully relational via the
    * drawup identity: with cum_t = Σ_{j≤t}(x_j − target), the clamped
    * CUSUM S_t = max(0, S_{t−1} + x_t − target) equals
    * cum_t − min_{j≤t} cum_j — two running window functions over each
    * key's (ts, tie)-ordered rows, NO sequential fold, no UDF, exact
    * BIGINT throughout. Returns one row per key:
    * (keys..., max_cusum, alarm, alarm_ts_us = first breach time or
    * NULL) — "this sensor's mean has drifted above target since t". */
  def cusumAlarm(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, valueCol: String, target: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"cusumAlarm: need threshold > 0, got $threshold")
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.unix_micros(F.col(tsCol)).asc, F.col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = ensureTimestamp(df, tsCol)
      .withColumn("_cum",
        F.sum(F.col(valueCol).cast("long") - F.lit(target)).over(w))
      // min over prefixes INCLUDING the empty one (cum_0 = 0): without
      // the least(0, ·) an all-positive stream would subtract its own
      // first step
      .withColumn("_cusum",
        F.col("_cum") - F.least(F.lit(0L), F.min("_cum").over(w)))
    scored.groupBy(keys.map(F.col): _*)
      .agg(F.max("_cusum").as("max_cusum"),
        F.max(F.col("_cusum") >= threshold).as("alarm"),
        F.min(F.when(F.col("_cusum") >= threshold,
          F.unix_micros(F.col(tsCol)))).as("alarm_ts_us"))
  }

  /** Seasonal baseline + residual: the per-(key, season-slot) mean of an
    * integer measure (`sum div n` — exact) joined back as each row's
    * expected value, residual = value − baseline. The slot is any
    * caller-supplied cyclic extraction (hour-of-day, day-of-week …); the
    * residual stream is what [[madOutliers]] / [[cusumAlarm]] should see
    * when the signal has known seasonality — otherwise every morning
    * peak looks like drift. One group-sized aggregation + one equi-join;
    * all BIGINT. */
  def seasonalBaseline(df: DataFrame, keys: Seq[String], valueCol: String,
      slot: Column, slotName: String = "slot"): DataFrame = {
    val withSlot = df.withColumn(slotName, slot.cast("long"))
    val base = withSlot
      .groupBy((keys :+ slotName).map(F.col): _*)
      .agg(F.expr(s"sum(cast($valueCol as bigint)) div count(1)")
        .as("baseline"))
    withSlot.join(base, keys :+ slotName)
      .withColumn("residual",
        F.col(valueCol).cast("long") - F.col("baseline"))
  }

  /** Robust per-group outlier detection via the median/MAD rule (Hampel
    * identifier): a row is an outlier when |x − median| > threshold · MAD,
    * with MAD = median(|x − median|). Median/MAD resist up to 50%
    * contamination where mean/stddev are dragged by the outliers they
    * are supposed to find. Uses Spark's EXACT interpolated percentile
    * (the engine's proven quantile_cont twin), so on integer measures
    * every intermediate is an exact multiple of 0.5 and the verdicts are
    * bit-identical in any engine — the fixed-point convention the gate
    * exploits.
    *
    * Scale shape: two grouped percentile aggregations (group-sized, tiny)
    * + two equi-joins of the data against those group frames — no windows
    * over data-sized partitions, no driver state. Degenerate groups
    * (MAD = 0: over half the group identical) flag only rows strictly
    * unequal to the median when threshold > 0, a documented property of
    * the identifier. */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(keys.nonEmpty, "madOutliers: need group keys")
    require(threshold > 0, s"madOutliers: need threshold > 0, got $threshold")
    val med = df.groupBy(keys.map(F.col): _*)
      .agg(F.percentile(F.col(valueCol), F.lit(0.5)).as("med"))
    val withMed = df.join(med, keys)
      .withColumn("_absdev", F.abs(F.col(valueCol) - F.col("med")))
    val mad = withMed.groupBy(keys.map(F.col): _*)
      .agg(F.percentile(F.col("_absdev"), F.lit(0.5)).as("mad"))
    withMed.join(mad, keys)
      .withColumn("is_outlier", F.col("_absdev") > F.lit(threshold) * F.col("mad"))
      .drop("_absdev")
  }

  /** First-order transition statistics over per-entity ordered event
    * streams: for every (from, to) adjacent pair in each entity's
    * timeline, the global count and the row probability in ppm
    * (`cnt·10⁶ div Σ_to cnt` — exact integer division). The Markov-chain
    * view of "what do users do next", and the input to next-event
    * prediction / anomalous-flow detection.
    *
    * Ordering is (ts, tieCols...) per entity — supply a unique tie-break
    * (an event id) to make the lag deterministic under simultaneous
    * events. ONE window over entity partitions (lag is O(1) state) + one
    * (from,to)-sized groupBy; output is |alphabet|², independent of the
    * stream size. */
  def transitionCounts(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (F.col(tsCol) +: tieCols.map(F.col)).map(_.asc)
    val w = Window.partitionBy(F.col(entityCol)).orderBy(order: _*)
    val pairs = df
      .withColumn("_from", F.lag(F.col(typeCol), 1).over(w))
      .filter(F.col("_from").isNotNull)
      .groupBy(F.col("_from").as("from_type"), F.col(typeCol).as("to_type"))
      .agg(F.count(F.lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_type").agg(F.sum("cnt").as("_tot"))
    pairs.join(F.broadcast(totals), Seq("from_type"))
      .select(F.col("from_type"), F.col("to_type"), F.col("cnt"),
        F.expr("(cnt * 1000000) div _tot").as("prob_ppm"))
  }

  /** Per-key forward fill (LOCF — last observation carried forward): null
    * cells take the key's most recent non-null value in (ts, tie) order;
    * leading nulls stay null (nothing to carry). The gap-repair step
    * ahead of any equal-spacing assumption (seasonal baselines, lag
    * features, resampling). ONE keyed window (`last(x, ignoreNulls)` is
    * O(1) running state — no buffer), a key's rows never leave its
    * partition. Adds `<valueCol>_filled`. */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (F.col(tsCol) +: tieCols.map(F.col)).map(_.asc)
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_filled",
      F.last(F.col(valueCol), ignoreNulls = true).over(w))
  }

  /** Layout-quality audit over file (or partition) key ranges: for every
    * file, how many files' [lo, hi] ranges overlap its own (self
    * included — a perfectly clustered, range-disjoint layout scores 1
    * everywhere; an unsorted layout scores ≈ |files|, meaning every
    * point lookup touches every file). This is the number data-skipping
    * actually divides by, measured before and after a Z-ORDER/compaction
    * rewrite ([[zOrderKey]] / [[compactionBins]]). The quadratic join
    * runs on FILE METADATA (catalog-sized, thousands of rows — broadcast
    * nested loop is the honest plan and is hinted; the data itself is
    * never touched). Adds `overlaps`. */
  def rangeOverlapAudit(files: DataFrame, loCol: String,
      hiCol: String): DataFrame = {
    val other = F.broadcast(files.select(F.col(loCol).cast("long").as("_lo2"),
      F.col(hiCol).cast("long").as("_hi2")))
    files.join(other,
        F.col(loCol).cast("long") <= F.col("_hi2") &&
        F.col("_lo2") <= F.col(hiCol).cast("long"))
      .groupBy(files.columns.map(F.col).toSeq: _*)
      .agg(F.count(F.lit(1)).as("overlaps"))
  }

  /** Lakehouse compaction planner: assign files (or any sized work items)
    * to target-sized bins by CUMULATIVE FILL along a caller-fixed total
    * order — `bin = (cumsum − size) div targetSize`, i.e. a file belongs
    * to the bin its first byte lands in. Deterministic, one-pass, and
    * contiguous (each bin is a consecutive run in the order), which is
    * exactly what a small-file compaction job wants: stable groups that
    * can be re-planned incrementally. Bins overshoot by at most one file
    * (the classic next-fit guarantee — within 2× of optimal bin count;
    * first-fit-decreasing is inherently sequential and NOT worth a
    * driver loop at 100 TB). Built on the distributed range-partitioned
    * prefix sum ([[globalCumsum]]) — no global window, no single
    * partition anywhere. Sizes must be positive. Output: input columns +
    * `bin` (0-based). */
  def compactionBins(df: DataFrame, sizeCol: String, targetSize: Long,
      order: Column*): DataFrame = {
    require(targetSize > 0, s"compactionBins: targetSize=$targetSize")
    globalCumsum(df.withColumn("_sz", F.col(sizeCol).cast("long")),
      "_sz", "_cum", order: _*)
      .withColumn("bin", F.expr(s"(_cum - _sz) div ${targetSize}L"))
      .drop("_sz", "_cum")
  }

  /** Exact Gini concentration coefficient over per-key masses (item
    * exposure, revenue by account, tokens by source):
    *
    *   G = (2·Σᵢ i·xᵢ − (n+1)·S) / (n·S),  xᵢ ascending, i = 1..n
    *
    * emitted as `gini_ppm` — 0 ⟺ perfectly even, → 10⁶ ⟺ one key holds
    * everything. The ranks come from the range-partitioned prefix-sum
    * machinery (position rides the same pass), NEVER a single-partition
    * window; ties order by key for determinism (G is tie-order-invariant
    * — equal masses swap freely in Σi·xᵢ... their contribution changes
    * only by equal amounts in opposite directions). One groupBy + the
    * prefix pass + a 1-row fold. Returns (keys = n, total = S,
    * gini_ppm). The ppm rational is computed in DECIMAL(38,0) — the
    * numerator carries a 10⁶ multiplier on top of 2·Σi·xᵢ (≈ n·S), so
    * BIGINT would overflow once n·S·10⁶ > 2⁶³ ≈ n·S > 9·10¹², well
    * inside real corpus sizes; DECIMAL(38,0) holds n·S·10⁶ to ~10³⁸
    * (same pattern as chiSquareCells / proportionTest). */
  def giniConcentration(df: DataFrame, keyCol: String,
      valueCol: Option[String] = None): DataFrame = {
    // mass per key: row count, or the exact integral sum of valueCol
    // (revenue in cents, tokens, bytes) — same formula either way
    val counts = df.groupBy(F.col(keyCol).as("_k"))
      .agg(valueCol.fold(F.count(F.lit(1)))(v =>
        F.sum(F.col(v).cast("long"))).as("_x"))
    val ranked = globalCumsumWithPos(counts, "_x", "_cum", Some("_i"),
      F.col("_x").asc, F.col("_k").asc)
    ranked.agg(F.count(F.lit(1)).as("keys"), F.sum("_x").as("total"),
      // Σi·xᵢ reaches ~n·S, past BIGINT for large corpora — accumulate
      // in DECIMAL(38,0) like the ppm rational below
      F.sum(F.expr("CAST(_i AS DECIMAL(38, 0)) * _x")).as("_ix"))
      .select(F.col("keys"), F.col("total"),
        F.expr("CAST((2 * _ix - CAST(keys + 1 AS DECIMAL(38, 0)) * total)" +
          " * 1000000 div (CAST(keys AS DECIMAL(38, 0)) * total)" +
          " AS BIGINT)").as("gini_ppm"))
  }

  /** Modal imputation: nulls in `valueCol` take their group's MOST
    * FREQUENT non-null value, ties broken by the smallest value (a total
    * order both engines share — "the mode" is otherwise undefined).
    * Groups that are entirely null stay null (no evidence). The
    * categorical companion to [[forwardFill]] (which needs an order).
    * One (group, value)-sized count + one argmax per group + one join
    * back. Adds `<valueCol>_imputed`. */
  def imputeMode(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val counts = df.filter(F.col(valueCol).isNotNull)
      .groupBy((keys.map(F.col) :+ F.col(valueCol).as("_v")): _*)
      .agg(F.count(F.lit(1)).as("_c"))
    val modes = counts.groupBy(keys.map(F.col): _*)
      .agg(F.min_by(F.col("_v"),
        F.struct(F.negate(F.col("_c")).as("_nc"), F.col("_v"))).as("_mode"))
    df.join(modes, keys, "left")
      .withColumn(s"${valueCol}_imputed",
        F.coalesce(F.col(valueCol), F.col("_mode")))
      .drop("_mode")
  }

  /** Local-peak detection per key: a row is a peak when its value
    * exceeds BOTH ordered neighbors by at least `minMargin`
    * (`v ≥ prev + m ∧ v ≥ next + m`; series endpoints are never peaks —
    * one-sided evidence). The spike-finding companion to [[cusumAlarm]]
    * (level shifts) and [[madOutliers]] (distributional outliers): this
    * one is about SHAPE. One keyed window (lag+lead share the pass).
    * Integral values; (ts, tie) ordering. Adds `is_peak`. */
  def detectPeaks(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, minMargin: Long = 1L,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(minMargin >= 0, s"detectPeaks: minMargin=$minMargin")
    val order = (F.col(tsCol) +: tieCols.map(F.col)).map(_.asc)
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(order: _*)
    val v = F.col(valueCol).cast("long")
    df.withColumn("_prev", F.lag(v, 1).over(w))
      .withColumn("_next", F.lead(v, 1).over(w))
      .withColumn("is_peak",
        F.col("_prev").isNotNull && F.col("_next").isNotNull &&
          v >= F.col("_prev") + minMargin && v >= F.col("_next") + minMargin)
      .drop("_prev", "_next")
  }

  /** Inter-arrival-time summary: per-key consecutive (ts, tie)-ordered
    * deltas in µs, folded to ONE row — (n, mean_us exact `Σ div n`,
    * p50_us / p90_us as the 6-decimal-rounded exact percentiles — the
    * winsorize-proven cross-engine form). The load-model input (arrival
    * burstiness, watermark sizing). One keyed lag window + one
    * aggregation. */
  def interArrivalStats(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val order = (F.unix_micros(F.col(tsCol)) +: tieCols.map(F.col))
      .map(_.asc)
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(order: _*)
    val deltas = ensureTimestamp(df, tsCol)
      .withColumn("_us", F.unix_micros(F.col(tsCol)))
      .withColumn("_d", F.col("_us") - F.lag("_us", 1).over(w))
      .filter(F.col("_d").isNotNull)
    deltas.agg(F.count(F.lit(1)).as("n"), F.sum("_d").as("_sum"),
      F.round(F.percentile(F.col("_d"), F.lit(0.5)), 6).as("p50_us"),
      F.round(F.percentile(F.col("_d"), F.lit(0.9)), 6).as("p90_us"))
      .select(F.col("n"), F.expr("_sum div n").as("mean_us"),
        F.col("p50_us"), F.col("p90_us"))
  }

  /** Key-skew report ahead of a shuffle: ONE row per audited key column —
    * (rows, keys, top1_rows, top10_rows, top1_share_ppm, top10_share_ppm)
    * — the numbers that decide broadcast vs salt vs AQE skew-join before
    * a 100 TB shuffle is committed. Counts via one groupBy; the top-10
    * crop via the O(k)-state bounded heap (never a |keys|-wide sort);
    * ties broken by key for determinism. Keys of ANY type are audited:
    * grouping is on xxhash64 of the raw column (a BIGINT cast would
    * collapse every non-numeric key to NULL = one group), so `rows` and
    * `keys` are exact up to 64-bit hash collisions — negligible for a
    * skew diagnostic. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(F.xxhash64(F.col(keyCol)).as("_k"))
      .agg(F.count(F.lit(1)).as("_c"))
    // heap ties at the 10th place pick an arbitrary equal-count key —
    // irrelevant to the aggregate (tied keys contribute the same count)
    val top = getTopKRecsBounded(
      counts.select(F.lit(0L).as("_g"), F.col("_k"),
        F.col("_c").cast("double").as("_r")), 10, "_g", "_k", "_r")
      .join(counts, Seq("_k"))
    val topAgg = top.agg(F.max("_c").as("top1_rows"),
      F.sum("_c").as("top10_rows"))
    counts.agg(F.sum("_c").as("rows"), F.count(F.lit(1)).as("keys"))
      .crossJoin(F.broadcast(topAgg))
      .select(F.col("rows"), F.col("keys"), F.col("top1_rows"),
        F.col("top10_rows"),
        F.expr("(top1_rows * 1000000) div rows").as("top1_share_ppm"),
        F.expr("(top10_rows * 1000000) div rows").as("top10_share_ppm"))
  }

  /** Exact rolling distinct count per key over a trailing event-time
    * window: for every row, |distinct values| among the key's rows in
    * `[ts − windowSeconds, ts]` (RANGE frame — simultaneous rows are
    * peers, so ties are deterministic). State per window = the distinct
    * set, bounded by the window span; for unbounded cardinality swap in
    * the HLL register sketch. Adds `rolling_distinct`. */
  def rollingDistinct(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"rollingDistinct: $windowSeconds")
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.unix_micros(F.col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    ensureTimestamp(df, tsCol).withColumn("rolling_distinct",
      F.size(F.collect_set(F.col(valueCol)).over(w)).cast("long"))
  }

  /** Frequent 3-itemsets over baskets (the Apriori level the pairwise
    * AssociationRules model stops short of): per basket the C(n,3)
    * ordered triples a<b<c via a double self-join on the basket key,
    * counted and support-thresholded. The blowup is per-BASKET cubic, so
    * `maxBasket` drops jumbo baskets before the join (the ItemKNN
    * maxUserHistory contract — at 100 TB one 10⁶-item basket would
    * otherwise emit 10¹⁸ rows); duplicates inside a basket collapse
    * first. Output: (item_a, item_b, item_c, support). */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1 && maxBasket >= 3,
      s"frequentTriples: minSupport=$minSupport maxBasket=$maxBasket")
    val items = df.select(F.col(basketCol).as("_bk"),
      F.col(itemCol).cast("long").as("_it")).distinct()
    val sized = items.join(
      items.groupBy("_bk").agg(F.count(F.lit(1)).as("_n"))
        .filter(F.col("_n") <= maxBasket).select("_bk"),
      Seq("_bk"), "left_semi")
    val a = sized.select(F.col("_bk"), F.col("_it").as("item_a"))
    val b = sized.select(F.col("_bk"), F.col("_it").as("item_b"))
    val c = sized.select(F.col("_bk"), F.col("_it").as("item_c"))
    a.join(b, Seq("_bk")).filter(F.col("item_a") < F.col("item_b"))
      .join(c, Seq("_bk")).filter(F.col("item_b") < F.col("item_c"))
      .groupBy("item_a", "item_b", "item_c")
      .agg(F.count(F.lit(1)).as("support"))
      .filter(F.col("support") >= minSupport)
  }

  /** Randomized response (Warner 1965 — the local-DP mechanism): each
    * row's boolean is reported truthfully with probability 1−p and
    * FLIPPED with p = flipNum/flipDen, the coin being the portable hash
    * of the row id (deterministic, engine-replayable, no RNG state).
    * ε = ln((1−p)/p). Adds `reported`. Pair with [[rrDebias]]. */
  def randomizedResponse(df: DataFrame, idCol: String, boolCol: String,
      flipNum: Long, flipDen: Long, seed: Long = 7L): DataFrame = {
    require(flipNum > 0 && flipNum * 2 < flipDen,
      s"randomizedResponse: p=$flipNum/$flipDen must be in (0, 1/2)")
    val flip = PortableHash.long(seed, F.col(idCol)) % flipDen < flipNum
    df.withColumn("reported",
      F.when(flip, !F.col(boolCol)).otherwise(F.col(boolCol)))
  }

  /** Unbiased estimate of the TRUE positive share from randomized
    * responses: E[obs] = t(1−p) + (n−t)p ⟹ t̂ = (obs − p·n)/(1−2p),
    * emitted as exact ppm `(obs·den − num·n)·10⁶ div ((den − 2·num)·n)`
    * (clamped to [0, 10⁶] — sampling noise can push the raw estimate
    * outside the simplex). One scalar aggregation. */
  def rrDebias(df: DataFrame, reportedCol: String, flipNum: Long,
      flipDen: Long): DataFrame =
    df.agg(F.count(F.lit(1)).as("n"),
      F.sum(F.col(reportedCol).cast("long")).as("reported_true"))
      .withColumn("est_true_ppm",
        F.greatest(F.lit(0L), F.least(F.lit(1000000L), F.expr(
          s"((reported_true * $flipDen - $flipNum * n) * 1000000)" +
            s" div (($flipDen - 2 * $flipNum) * n)"))))

  /** Cohen's κ inter-rater agreement between two categorical columns,
    * EXACTLY: with the contingency cells o, marginals rt/ct and
    * N = Σo,
    *
    *   κ = (N·agree − Σ_c rt_c·ct_c) / (N² − Σ_c rt_c·ct_c)
    *
    * — an integer rational; sign applied AFTER dividing non-negatives
    * (the [[autocorrStats]] div-vs-floor rule), so `kappa_ppm` is
    * engine-exact. κ=10⁶ ⟺ perfect agreement, 0 ⟺ chance, negative ⟺
    * systematic disagreement. One cells groupBy + marginal joins on the
    * CATEGORY (both raters must label from the same set). Returns one
    * row (n, agree, pe_scaled, kappa_ppm); NULL κ when the denominator
    * is 0 (both raters constant). Overflow: N² < 2⁶³. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(F.col(aCol).cast("string").as("a"),
        F.col(bCol).cast("string").as("b"))
      .agg(F.count(F.lit(1)).as("o"))
    val rt = cells.groupBy(F.col("a").as("c")).agg(F.sum("o").as("rt"))
    val ct = cells.groupBy(F.col("b").as("c")).agg(F.sum("o").as("ct"))
    val pe = rt.join(ct, Seq("c"), "inner")
      .agg(F.coalesce(F.sum(F.col("rt") * F.col("ct")), F.lit(0L))
        .as("pe_scaled"))
    cells.agg(F.sum("o").as("n"),
      F.sum(F.when(F.col("a") === F.col("b"), F.col("o")).otherwise(0L))
        .as("agree"))
      .crossJoin(F.broadcast(pe))
      .withColumn("kappa_ppm", F.expr(
        """CASE WHEN n * n - pe_scaled > 0
          |  THEN (CASE WHEN n * agree - pe_scaled < 0 THEN -1L ELSE 1L END)
          |       * ((abs(n * agree - pe_scaled) * 1000000)
          |          div (n * n - pe_scaled))
          |END""".stripMargin))
  }

  /** Golden-record survivorship (the MDM step after duplicate
    * clustering): per key, each attribute takes its LATEST NON-NULL
    * value by version — `max_by(col, version-if-non-null)` skips null
    * cells entirely, so an attribute missing in the newest duplicate
    * falls back to the freshest row that HAS it; all-null stays null.
    * Versions must be unique per key (ties have no defined winner —
    * same contract as scdType2). ONE partial+final groupBy; output =
    * one row per key. Adds `n_merged`. */
  def goldenRecord(df: DataFrame, keys: Seq[String], versionCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "goldenRecord: need attribute columns")
    val aggs = cols.map(c =>
      F.max_by(F.col(c),
        F.when(F.col(c).isNotNull, F.col(versionCol))).as(c)) :+
      F.count(F.lit(1)).as("n_merged")
    df.groupBy(keys.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Pearson χ² test of independence between two categorical columns,
    * EXACTLY: the contingency table plus the statistic
    *
    *   χ² = Σ_cells (o·N − rt·ct)² / (N·rt·ct)
    *
    * (o = cell count, rt/ct = row/column marginals) — each cell's term an
    * integer rational computed in DECIMAL(38,0) ppm and floored, so the
    * sum is order-invariant and engine-exact; no float, no libm. Returns
    * the per-cell table (a, b, o, rt, ct, term_ppm) — callers sum
    * `term_ppm` and compare against the χ² critical value for
    * (|A|−1)(|B|−1) df in the same integer ppm space (the
    * [[proportionTest]] convention). Zero-marginal cells cannot occur
    * (every observed cell has rt, ct ≥ o ≥ 1). Shape: one groupBy for
    * cells (|A·B| rows), two tiny marginal aggregations broadcast back.
    * Overflow: (o·N)²·10⁶ < 10³⁸ → N < ~10¹⁴ rows. */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(F.col(aCol).as("a"), F.col(bCol).as("b"))
      .agg(F.count(F.lit(1)).as("o"))
    val rowTot = cells.groupBy("a").agg(F.sum("o").as("rt"))
    val colTot = cells.groupBy("b").agg(F.sum("o").as("ct"))
    val n = cells.agg(F.sum("o").as("_n"))
    // the FULL |A|×|B| grid, not just observed cells: a structural zero
    // still contributes (0−e)²/e = e to the statistic
    rowTot.crossJoin(colTot)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", F.coalesce(F.col("o"), F.lit(0L)))
      .crossJoin(F.broadcast(n))
      .select(F.col("a"), F.col("b"), F.col("o"), F.col("rt"), F.col("ct"),
        F.expr(
          """CAST((CAST(o * _n - rt * ct AS DECIMAL(38, 0))
            |       * (o * _n - rt * ct) * 1000000)
            |      div (CAST(_n AS DECIMAL(38, 0)) * rt * ct) AS BIGINT)"""
            .stripMargin).as("term_ppm"))
  }

  /** Frequent n-gram sequence mining over per-entity ordered timelines —
    * [[transitionCounts]] generalized from adjacent pairs to length-`n`
    * contiguous patterns ("view > click > purchase"), the PrefixSpan-lite
    * a product team actually queries: every occurrence counted (sliding,
    * overlapping), support-thresholded. The (n−1) lag columns come from
    * ONE window pass (same partition+order spec); the groupBy is bounded
    * by |alphabet|ⁿ, never the stream size. `sep` must not occur in the
    * type strings (gram identity). Output: (gram, cnt) with
    * cnt ≥ minCount. */
  def sequenceCounts(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, tieCols: Seq[String] = Nil, n: Int = 3,
      minCount: Long = 1L, sep: String = " > "): DataFrame = {
    require(n >= 2, s"sequenceCounts: need n >= 2, got $n")
    val order = (F.col(tsCol) +: tieCols.map(F.col)).map(_.asc)
    val w = Window.partitionBy(F.col(entityCol)).orderBy(order: _*)
    val lags = (n - 1 to 1 by -1).map(k =>
      F.lag(F.col(typeCol), k).over(w).as(s"_g$k"))
    val withLags = df.select((lags :+ F.col(typeCol).as("_g0")): _*)
    val parts = (n - 1 to 0 by -1).map(k => F.col(s"_g$k"))
    withLags
      .filter(parts.map(_.isNotNull).reduce(_ && _))
      .select(F.concat_ws(sep, parts: _*).as("gram"))
      .groupBy("gram").agg(F.count(F.lit(1)).as("cnt"))
      .filter(F.col("cnt") >= minCount)
  }

  /** Suppression-based k-anonymization: rows whose quasi-identifier
    * combination occurs < k times get those columns NULLed (cell
    * suppression — the simplest generalization lattice step); all other
    * columns and all rows survive. Implemented as the audit joined back on
    * the quasi key — the violating-combination side is small (long tail),
    * the data side shuffles once on the same key. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val bad = kAnonymityAudit(df, quasiCols, k)
      .filter(!F.col("anonymous"))
      .select(quasiCols.map(F.col): _*)
      .withColumn("_suppress", F.lit(true))
    val joined = df.join(bad, quasiCols, "left")
    val cols = df.columns.toSeq.map { c =>
      if (quasiCols.contains(c))
        F.when(F.coalesce(F.col("_suppress"), F.lit(false)), F.lit(null))
          .otherwise(F.col(c)).as(c)
      else F.col(c)
    }
    joined.select(cols: _*)
  }

  /** l-diversity audit (Machanavalhala et al. 2007) — the refinement
    * k-anonymity misses: a quasi-identifier group can be large (k-safe)
    * yet reveal everyone's sensitive value if that value is CONSTANT
    * within the group (the homogeneity attack). One row per observed
    * quasi-identifier combination: occupancy `n`, number of DISTINCT
    * sensitive values `l_distinct`, and the `diverse = l_distinct ≥ l`
    * verdict. ONE partial+final groupBy (count + count distinct share the
    * grouping); output bounded by #combinations, never the row count —
    * the companion gate to [[kAnonymityAudit]]. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit: need quasi columns")
    require(l >= 1, s"lDiversityAudit: need l >= 1, got $l")
    df.groupBy(quasiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"),
        F.count_distinct(F.col(sensitiveCol)).as("l_distinct"))
      .withColumn("diverse", F.col("l_distinct") >= l)
  }

  /** Leave-one-out target encoding (the target-leakage-safe mean encoder
    * used ahead of tree/linear fits): each row's category is encoded as
    * the mean target of the OTHER rows sharing it —
    * `enc_ppm = (Σ_cat target − target_row)·10⁶ div (n_cat − 1)`, exact
    * BIGINT, NULL for singleton categories (no peers — emitting the row's
    * own target would be pure leakage). Targets must be integral (cast
    * up-front); ONE category-sized groupBy + one join back on the
    * category (the aggregate side is |categories|, broadcast-sized when
    * the cardinality is modest; Spark/AQE picks broadcast vs shuffle).
    * Adds `enc_ppm`, preserves all input columns. */
  def targetEncodeLoo(df: DataFrame, catCol: String,
      targetCol: String): DataFrame = {
    val t = F.col(targetCol).cast("long")
    val agg = df.groupBy(F.col(catCol))
      .agg(F.sum(t).as("_csum"), F.count(F.lit(1)).as("_cn"))
    df.join(agg, Seq(catCol))
      .withColumn("enc_ppm",
        F.when(F.col("_cn") > 1L,
          F.expr(s"((_csum - CAST($targetCol AS BIGINT)) * 1000000) div (_cn - 1)")))
      .drop("_csum", "_cn")
  }

  /** Two-proportion z-test for an A/B experiment, EXACTLY: per variant
    * pair, trials/conversions and the squared z statistic under the
    * pooled-proportion null,
    *
    *   z² = (x_a·n_b − x_b·n_a)² · N / (n_a·n_b·x·(N−x))
    *
    * with x = x_a+x_b, N = n_a+n_b — an integer rational. The division is
    * carried out in DECIMAL(38,0) (the numerator can reach ~10³⁰, past
    * BIGINT but far inside 38 digits), so `z2_ppm` and the
    * `significant = z² > 3.841459` verdict (the χ²₁ 95% critical value,
    * compared in ppm — integer vs integer) are bit-exact in any engine —
    * no erf, no float sqrt, no libm. Input: one row per unit with a
    * variant label and a 0/1 conversion flag; `control` names the
    * baseline, every other variant is tested against it. One groupBy to
    * per-variant counts (|variants| rows), then a broadcast-sized
    * cross of treatments against the control row. NULL z2_ppm when a
    * side is empty or the pooled proportion is degenerate (x=0 or x=N:
    * zero variance — no evidence either way). */
  def proportionTest(df: DataFrame, variantCol: String, convertedCol: String,
      control: String): DataFrame = {
    val counts = df.groupBy(F.col(variantCol).as("variant"))
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col(convertedCol).cast("long")).as("x"))
    val ctrl = counts.filter(F.col("variant") === control)
      .select(F.col("n").as("n_ctrl"), F.col("x").as("x_ctrl"))
    counts.filter(F.col("variant") =!= control)
      .crossJoin(F.broadcast(ctrl))
      .withColumn("z2_ppm", F.expr(
        """CASE WHEN n > 0 AND n_ctrl > 0
          |       AND x + x_ctrl > 0 AND x + x_ctrl < n + n_ctrl
          |  THEN CAST((CAST(x * n_ctrl - x_ctrl * n AS DECIMAL(38, 0))
          |             * (x * n_ctrl - x_ctrl * n) * (n + n_ctrl) * 1000000)
          |            div (CAST(n AS DECIMAL(38, 0)) * n_ctrl * (x + x_ctrl)
          |                 * (n + n_ctrl - x - x_ctrl)) AS BIGINT)
          |END""".stripMargin))
      .withColumn("significant",
        F.col("z2_ppm").isNotNull && F.col("z2_ppm") > 3841459L)
      .select("variant", "n", "x", "n_ctrl", "x_ctrl", "z2_ppm", "significant")
  }

  /** Merge overlapping (or touching, gap ≤ `maxGap`) intervals per key —
    * the classic span-coalescing primitive (user activity spans, IP lease
    * windows, maintenance periods): a new merged group starts exactly
    * where an interval's start exceeds the running max end of everything
    * before it (plus the gap tolerance), so group ids are a per-key
    * cumulative sum of those break flags and the merge is one groupBy.
    * Inputs are integral start/end (cast up-front), `start ≤ end`
    * enforced. TWO keyed window passes (running max + cumsum, same
    * partition spec — one shuffle) + one aggregation; a key's intervals
    * never leave its partition. Output: (keys…, start, end, n_merged). */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, maxGap: Long = 0L): DataFrame = {
    require(maxGap >= 0L, s"mergeIntervals: maxGap=$maxGap")
    val byStart = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("_s").asc, F.col("_e").asc)
    val prevMaxEnd = F.max(F.col("_e")).over(byStart.rowsBetween(
      Window.unboundedPreceding, -1))
    val flagged = df
      .select((keys.map(F.col) :+ F.col(startCol).cast("long").as("_s") :+
        F.col(endCol).cast("long").as("_e")): _*)
      .withColumn("_brk",
        F.when(prevMaxEnd.isNull || F.col("_s") > prevMaxEnd + maxGap, 1L)
          .otherwise(0L))
      .withColumn("_grp", F.sum("_brk").over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy((keys.map(F.col) :+ F.col("_grp")): _*)
      .agg(F.min("_s").as("start"), F.max("_e").as("end"),
        F.count(F.lit(1)).as("n_merged"))
      .drop("_grp")
  }

  /** Per-key lag-k autocorrelation, k = 1..maxLag, as EXACT integer
    * sufficient statistics: over each key's (ts, tie)-ordered series the
    * lag-k pairs (x_t, x_{t−k}) yield Pearson components
    *
    *   num  = n·Σxy − Σx·Σy
    *   denx = n·Σx² − (Σx)²      deny = n·Σy² − (Σy)²
    *
    * (r = num/√(denx·deny)) — all BIGINT, plus the SIGNED squared
    * correlation `r2_ppm = sign(num)·num²·10⁶ div (denx·deny)` computed
    * in DECIMAL(38,0) so no square root or float ever appears: cell-exact
    * in any engine. NULL r2_ppm when either margin is constant (den = 0)
    * or fewer than 2 pairs. The seasonality/momentum detector feeding
    * [[seasonalBaseline]] (is there structure at lag k at all?).
    *
    * Values must be integral (cast up-front). ALL lag columns come from
    * ONE window pass (same partition+order spec); the stack to long
    * format is stateless. Output: (keys…, lag, n, num, denx, deny,
    * r2_ppm) — |keys|·maxLag rows. Overflow contract: n²·max|x|² < 2⁶³
    * per stat and n⁴·max|x|⁴ < 10³⁸ inside the decimal division. */
  def autocorrStats(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, maxLag: Int, tieCols: Seq[String] = Nil): DataFrame = {
    require(maxLag >= 1, s"autocorrStats: need maxLag >= 1, got $maxLag")
    require(keys.nonEmpty, "autocorrStats: need key columns")
    val order = (F.col(tsCol) +: tieCols.map(F.col)).map(_.asc)
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(order: _*)
    val x = F.col(valueCol).cast("long")
    val lagged = df.select(
      (keys.map(F.col) :+ x.as("_x")) ++
        (1 to maxLag).map(k => F.lag(x, k).over(w).as(s"_l$k")): _*)
    val stackExpr = (1 to maxLag)
      .map(k => s"${k}L, _l$k").mkString(s"stack($maxLag, ", ", ", ")")
    val pairs = lagged
      .select((keys.map(F.col) :+ F.col("_x") :+
        F.expr(stackExpr).as(Seq("lag", "_y")): _*))
      .filter(F.col("_y").isNotNull)
    pairs.groupBy((keys.map(F.col) :+ F.col("lag")): _*)
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("_x") * F.col("_y")).as("_sxy"),
        F.sum("_x").as("_sx"), F.sum("_y").as("_sy"),
        F.sum(F.col("_x") * F.col("_x")).as("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).as("_syy"))
      .select((keys.map(F.col) :+ F.col("lag") :+ F.col("n") :+
        F.expr("n * _sxy - _sx * _sy").as("num") :+
        F.expr("n * _sxx - _sx * _sx").as("denx") :+
        F.expr("n * _syy - _sy * _sy").as("deny")): _*)
      // sign applied AFTER the division of non-negatives: Spark `div`
      // truncates toward zero while SQL `//` floors — they agree only on
      // non-negative operands (num² is), so `sign·(num² div d)` is
      // engine-exact where `(sign·num²) div d` is not
      .withColumn("r2_ppm", F.expr(
        """CASE WHEN n >= 2 AND denx > 0 AND deny > 0
          |  THEN (CASE WHEN num < 0 THEN -1L ELSE 1L END)
          |       * CAST((CAST(num AS DECIMAL(38, 0)) * num * 1000000)
          |              div (CAST(denx AS DECIMAL(38, 0)) * deny) AS BIGINT)
          |END""".stripMargin))
  }
}
