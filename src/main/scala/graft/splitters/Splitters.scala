package graft.splitters

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.core.FeatureSchema.{QueryId, ItemId, Timestamp}

/** Train/test relational splits (reference: replay/splitters/).
  *
  * Each splitter's core is `mark`: annotate every interaction with an
  * `is_test` boolean — one declarative plan, no collect. `split` filters it
  * into the (train, test) pair and applies the shared post-steps:
  * drop-cold (semi-join on train entities, base_splitter.py:130-143) and
  * session-boundary repair (first/last of is_test over (user, session),
  * base_splitter.py:198-209).
  *
  * Seeded randomness (SURVEY §7.4.5): Spark's `rand(seed)` is
  * partition-dependent, so all "random" strategies here use a deterministic
  * md5-order hash of (seed, entity) — reproducible across cluster layouts
  * AND expressible in ANSI SQL for the DuckDB oracle.
  */
trait Splitter {
  def queryCol: String
  def itemCol: String
  def dropColdItems: Boolean
  def dropColdUsers: Boolean

  /** Annotate with `is_test`; must be deterministic. */
  def mark(df: DataFrame): DataFrame

  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val marked = mark(df)
    val train = marked.filter(!F.col("is_test")).drop("is_test")
    var test  = marked.filter(F.col("is_test")).drop("is_test")
    if (dropColdItems)
      test = test.join(train.select(itemCol).distinct(), Seq(itemCol), "left_semi")
    if (dropColdUsers)
      test = test.join(train.select(queryCol).distinct(), Seq(queryCol), "left_semi")
    (train, test)
  }
}

object Splitter {
  /** Portable deterministic pseudo-random ordering key — delegates to the
    * single shared recipe in [[graft.core.PortableHash]]. */
  def hashKey(seed: Long, cols: Column*): Column =
    graft.core.PortableHash.key(seed, cols: _*)

  /** Same, as a BIGINT in [0, 2^60). */
  def hashLong(seed: Long, cols: Column*): Column =
    graft.core.PortableHash.long(seed, cols: _*)

  /** Repair split flags that cut a session in half: every event of a
    * (user, session) takes the flag of the session's LAST event
    * (reference base_splitter.py:198-209 first/last over unbounded window).
    * `tieCols` break timestamp ties so "last" is deterministic. */
  def repairSessions(marked: DataFrame, queryCol: String, sessionCol: String,
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = F.col(tsCol).asc +: tieCols.map(F.col(_).asc)
    val w = Window.partitionBy(queryCol, sessionCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    marked.withColumn("is_test", F.last("is_test").over(w))
  }
}

/** Per-user tail fraction by time order (reference: ratio_splitter.py:180-260). */
final case class RatioSplitter(
    testSize: Double,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    tieCol: Option[String] = Some(ItemId),
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val order = Seq(F.col(tsCol).asc) ++ tieCol.map(F.col(_).asc).toSeq
    val w = Window.partitionBy(queryCol).orderBy(order: _*)
    val wc = Window.partitionBy(queryCol)
    df.withColumn("_rn", F.row_number().over(w))
      .withColumn("_n", F.count(F.lit(1)).over(wc))
      // row is test when its position fraction exceeds the train share
      .withColumn("is_test", F.col("_rn") > F.col("_n") * (1.0 - testSize))
      .drop("_rn", "_n")
  }
}

/** Last N interactions (or last N seconds) per user
  * (reference: last_n_splitter.py:186-366). */
final case class LastNSplitter(
    n: Int,
    byTimeSeconds: Boolean = false,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    tieCol: Option[String] = Some(ItemId),
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame =
    if (byTimeSeconds) {
      val w = Window.partitionBy(queryCol)
      df.withColumn("_max_ts", F.max(tsCol).over(w))
        .withColumn("is_test",
          F.unix_timestamp(F.col(tsCol)) > F.unix_timestamp(F.col("_max_ts")) - n)
        .drop("_max_ts")
    } else {
      val order = Seq(F.col(tsCol).asc) ++ tieCol.map(F.col(_).asc).toSeq
      val w = Window.partitionBy(queryCol).orderBy(order: _*)
      val wc = Window.partitionBy(queryCol)
      df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn("is_test", F.col("_rn") > F.col("_n") - n)
        .drop("_rn", "_n")
    }
}

/** Global time threshold — literal or quantile of the timestamp distribution
  * (reference: time_splitter.py:186-206). */
final case class TimeSplitter(
    threshold: String, // timestamp literal; quantile variant in companion
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame =
    df.withColumn("is_test", F.col(tsCol) >= F.lit(threshold).cast("timestamp"))
}

object TimeSplitter {
  /** Quantile variant: the cut is the smallest timestamp t such that at
    * least `q` of rows have ts <= t (rank-based, no interpolation —
    * portable to SQL). The running count goes through the distributed
    * prefix sum (`Ops.globalCumsum`), not a global `Window.orderBy`: with
    * fine-grained timestamps the distinct-ts frame approaches the row
    * count, so a single-partition window over it is the one task that
    * would hold the whole log at 100 TB. */
  def byQuantile(df: DataFrame, q: Double, tsCol: String = Timestamp): DataFrame = {
    // r13 (guide §1.2/§2.4): n == Σ_c over the per-ts counts, so deriving it
    // from the (|distinct ts|-sized, cached) counts frame drops the separate
    // full-log df.count() pass this splitter used to pay — one less full
    // scan+join per caller (~30 queries share this prologue).
    val counts = graft.core.Ops.globalCumsum(
      df.groupBy(tsCol).agg(F.count(F.lit(1)).as("_c")),
      "_c", "_cum", F.col(tsCol).asc).cache()
    val n = counts.agg(F.sum("_c")).first() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
    val cutRank = math.ceil(n * q).toLong
    // .get(0) + F.lit: works for both TimestampType and TimestampNTZType
    // (parquet ms-timestamps arrive as NTZ in Spark 4 → LocalDateTime)
    val cut = counts.filter(F.col("_cum") >= cutRank)
      .agg(F.min(tsCol)).first().get(0)
    counts.unpersist()
    df.withColumn("is_test", F.col(tsCol) > F.lit(cut))
  }

  /** Equal-count time buckets for walk-forward backtesting: bucket =
    * ⌊(cum_ts − 1) · k / n⌋ ∈ [0, k), where cum_ts = #rows with ts ≤ the
    * row's ts (rows sharing a timestamp share a bucket — the cut can't
    * split a tie, same rank-based portability as [[byQuantile]]). All
    * arithmetic is exact Long, mirrored verbatim in the SQL oracle; the
    * running count goes through the distributed prefix sum, no global
    * window. */
  def walkForwardBuckets(df: DataFrame, k: Int,
      tsCol: String = Timestamp): DataFrame = {
    require(k >= 2, s"need k >= 2 buckets, got $k")
    require(Seq("bucket", "_c", "_cum").forall(!df.columns.contains(_)),
      "input may not contain bucket/_c/_cum columns")
    val n = df.count()
    require(n > 0, "walkForwardBuckets on an empty frame")
    val counts = graft.core.Ops.globalCumsum(
      df.groupBy(tsCol).agg(F.count(F.lit(1)).as("_c")),
      "_c", "_cum", F.col(tsCol).asc)
    // `div` = exact integer division (Spark's `/` would go through double);
    // non-negative operands make it the floor
    df.join(counts.select(F.col(tsCol),
        F.expr(s"((_cum - 1) * $k) div $n").as("bucket")),
      Seq(tsCol))
  }

  /** Expanding-window walk-forward folds over [[walkForwardBuckets]]:
    * fold f (1 ≤ f < k) trains on buckets < f and tests on bucket f —
    * every fold's test period is strictly after everything it trained on,
    * the leak-free backtest shape. One bucket pass, k−1 lazy filters. */
  def walkForward(df: DataFrame, k: Int,
      tsCol: String = Timestamp): Seq[(DataFrame, DataFrame)] = {
    val marked = walkForwardBuckets(df, k, tsCol)
    (1 until k).map { f =>
      (marked.filter(F.col("bucket") < f).drop("bucket"),
        marked.filter(F.col("bucket") === f).drop("bucket"))
    }
  }
}

/** Hash-random row split (reference random_splitter.py:47-51 uses
  * `randomSplit`; here rows hash deterministically so the split is
  * reproducible and oracle-checkable). */
final case class HashRandomSplitter(
    testSize: Double,
    seed: Long = 42,
    keyCols: Seq[String],
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val h = Splitter.hashLong(seed, keyCols.map(F.col): _*)
    // uniform in [0,1): hash / 2^60
    df.withColumn("is_test", (h / F.lit(math.pow(2, 60))) < testSize)
  }
}

/** Users whose first event lands in the most recent tail such that test
  * holds ~testSize of users (reference: new_users_splitter.py:133-167). */
final case class NewUsersSplitter(
    testSize: Double,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val firsts = df.groupBy(queryCol).agg(F.min(tsCol).as("_first_ts"))
    // distributed global rank (no single-partition window over all users);
    // total user count as a broadcast 1-row frame, not a global window
    val ranked = graft.core.Ops.globalRowNumber(firsts, "_rn",
        F.col("_first_ts").desc, F.col(queryCol).desc)
      .crossJoin(F.broadcast(firsts.agg(F.count(F.lit(1)).as("_nq"))))
      .withColumn("_is_new", F.col("_rn") <= F.col("_nq") * testSize)
      .select(F.col(queryCol), F.col("_is_new"))
    df.join(ranked, Seq(queryCol), "left")
      .withColumn("is_test", F.coalesce(F.col("_is_new"), F.lit(false)))
      .drop("_is_new")
  }
}

/** Random user subset → ALL their events to test
  * (reference: cold_user_random_splitter.py:77-94); user choice via the
  * portable hash order. */
final case class ColdUserSplitter(
    testSize: Double,
    seed: Long = 42,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val users = df.select(queryCol).distinct()
      .withColumn("_hk", Splitter.hashKey(seed, F.col(queryCol)))
    val picked = graft.core.Ops.globalRowNumber(users, "_rn",
        F.col("_hk").asc, F.col(queryCol).asc)
      .crossJoin(F.broadcast(users.agg(F.count(F.lit(1)).as("_nq"))))
      .withColumn("_picked", F.col("_rn") <= F.col("_nq") * testSize)
      .select(F.col(queryCol), F.col("_picked"))
    df.join(picked, Seq(queryCol), "left")
      .withColumn("is_test", F.coalesce(F.col("_picked"), F.lit(false)))
      .drop("_picked")
  }
}

/** Stage 1: hash-pick a user fraction; stage 2: per-picked-user tail
  * fraction of events by time (reference: two_stage_splitter.py:118-431). */
final case class TwoStageSplitter(
    userFraction: Double,
    itemTestSize: Double,
    seed: Long = 42,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    tieCol: Option[String] = Some(ItemId),
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val users = df.select(queryCol).distinct()
      .withColumn("_hk", Splitter.hashKey(seed, F.col(queryCol)))
    val picked = graft.core.Ops.globalRowNumber(users, "_rn",
        F.col("_hk").asc, F.col(queryCol).asc)
      .crossJoin(F.broadcast(users.agg(F.count(F.lit(1)).as("_nq"))))
      .withColumn("_picked", F.col("_rn") <= F.col("_nq") * userFraction)
      .select(F.col(queryCol), F.col("_picked"))
    val order = Seq(F.col(tsCol).asc) ++ tieCol.map(F.col(_).asc).toSeq
    val w = Window.partitionBy(queryCol).orderBy(order: _*)
    val wc = Window.partitionBy(queryCol)
    df.join(picked, Seq(queryCol), "left")
      .withColumn("_rn", F.row_number().over(w))
      .withColumn("_cnt", F.count(F.lit(1)).over(wc))
      .withColumn("is_test",
        F.coalesce(F.col("_picked"), F.lit(false)) &&
          F.col("_rn") > F.col("_cnt") * (1.0 - itemTestSize))
      .drop("_picked", "_rn", "_cnt")
  }
}

/** K folds per user by hash order (reference: k_folds.py:77-101 uses
  * row_number over rand; here the order key is the portable hash). */
final case class KFolds(
    nFolds: Int,
    seed: Long = 42,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) {
  /** Adds `fold` in [0, nFolds). */
  def assign(df: DataFrame, rowKeyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(queryCol)
      .orderBy(Splitter.hashKey(seed, rowKeyCols.map(F.col): _*) +: rowKeyCols.map(F.col(_).asc): _*)
    df.withColumn("fold", ((F.row_number().over(w) - 1) % nFolds).cast("long"))
  }

  def folds(df: DataFrame, rowKeyCols: Seq[String]): Seq[(DataFrame, DataFrame)] = {
    val assigned = assign(df, rowKeyCols)
    (0 until nFolds).map { f =>
      (assigned.filter(F.col("fold") =!= f).drop("fold"),
       assigned.filter(F.col("fold") === f).drop("fold"))
    }
  }
}

/** Deterministic pseudo-random cut per user: cut = hash(user) mod count,
  * test = next N events after the cut
  * (reference: random_next_n_splitter.py:178-231 xxhash64-pmod). */
final case class RandomNextNSplitter(
    n: Int,
    seed: Long = 42,
    queryCol: String = QueryId,
    itemCol: String = ItemId,
    tsCol: String = Timestamp,
    tieCol: Option[String] = Some(ItemId),
    dropColdItems: Boolean = false,
    dropColdUsers: Boolean = false,
) extends Splitter {
  def mark(df: DataFrame): DataFrame = {
    val order = Seq(F.col(tsCol).asc) ++ tieCol.map(F.col(_).asc).toSeq
    val w = Window.partitionBy(queryCol).orderBy(order: _*)
    val wc = Window.partitionBy(queryCol)
    df.withColumn("_rn", F.row_number().over(w))
      .withColumn("_cnt", F.count(F.lit(1)).over(wc))
      .withColumn("_cut", F.pmod(Splitter.hashLong(seed, F.col(queryCol)), F.col("_cnt")))
      .withColumn("is_test",
        F.col("_rn") > F.col("_cut") && F.col("_rn") <= F.col("_cut") + n)
      .drop("_rn", "_cnt", "_cut")
  }
}
