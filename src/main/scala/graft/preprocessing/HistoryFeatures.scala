package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.core.FeatureSchema.{QueryId, ItemId, Rating, Timestamp}

/** Log-statistics feature generator
  * (reference: replay/preprocessing/history_based_fp.py:39-459).
  *
  * Per-entity (user or item) features from the interaction log:
  * count, log(count), mean/min/max/stddev of rating (stddev nulls → 0,
  * history_based_fp.py:92-101), distinct active days and its log
  * (history_based_fp.py:75-80), plus cross-features: abnormality
  * (mean |rating − item mean|, history_based_fp.py:158-194) and
  * cross-entity conditional means (131-155). One hash aggregation per
  * feature family.
  */
object HistoryFeatures {
  def entityStats(log: DataFrame, entityCol: String,
      ratingCol: String = Rating, tsCol: String = Timestamp): DataFrame =
    log.groupBy(entityCol).agg(
      F.count(F.lit(1)).as("cnt"),
      F.log(F.count(F.lit(1))).as("log_cnt"),
      F.avg(ratingCol).as("mean_rating"),
      F.min(ratingCol).as("min_rating"),
      F.max(ratingCol).as("max_rating"),
      F.coalesce(F.stddev(ratingCol), F.lit(0.0)).as("std_rating"),
      F.countDistinct(F.date_trunc("dd", F.col(tsCol))).as("active_days"),
      F.log(F.countDistinct(F.date_trunc("dd", F.col(tsCol)))).as("log_active_days"),
    )

  /** Per-user abnormality: mean absolute deviation of the user's ratings
    * from each item's mean rating (history_based_fp.py:158-176). */
  def abnormality(log: DataFrame, queryCol: String = QueryId,
      itemCol: String = ItemId, ratingCol: String = Rating): DataFrame = {
    val itemMeans = log.groupBy(itemCol).agg(F.avg(ratingCol).as("_im"))
    log.join(itemMeans, Seq(itemCol))
      .groupBy(queryCol)
      .agg(F.avg(F.abs(F.col(ratingCol) - F.col("_im"))).as("abnormality"))
  }

  /** Cross-entity conditional mean: for each value of `byCol` (e.g. a
    * category), the mean rating of the other entity's interactions
    * (history_based_fp.py:131-155 shape). */
  def conditionalMean(log: DataFrame, entityCol: String, byCol: String,
      ratingCol: String = Rating): DataFrame =
    log.groupBy(entityCol, byCol).agg(F.avg(ratingCol).as(s"mean_by_$byCol"))
}

/** Item-recency smoothing kernels (reference: replay/utils/time.py:10-254;
  * kernels at time.py:125-133): weight an interaction by the age of the
  * item at interaction time.
  *  - power:  (age_days + 1) ^ (−alpha)
  *  - exp:    c ^ age_days  (c in (0,1])
  *  - linear: max(1 − alpha·age_days, 0)
  */
object TimeSmoothing {
  def ageDays(ts: Column, refTs: Column): Column =
    (F.unix_micros(refTs.cast("timestamp")) - F.unix_micros(ts.cast("timestamp")))
      .cast("double") / F.lit(86400.0 * 1e6)

  def powerKernel(age: Column, alpha: Double): Column =
    F.pow(age + F.lit(1.0), F.lit(-alpha))

  def expKernel(age: Column, c: Double): Column =
    F.pow(F.lit(c), age)

  def linearKernel(age: Column, alpha: Double): Column =
    F.greatest(F.lit(1.0) - F.lit(alpha) * age, F.lit(0.0))

  /** Apply a named kernel to the rating column against the log's max
    * timestamp (reference smooth entry point). */
  def smooth(log: DataFrame, kernel: String, alpha: Double,
      ratingCol: String = Rating, tsCol: String = Timestamp): DataFrame = {
    val maxTs = log.agg(F.max(tsCol)).first().get(0)
    val age = ageDays(F.col(tsCol), F.lit(maxTs))
    val w = kernel match {
      case "power"  => powerKernel(age, alpha)
      case "exp"    => expKernel(age, alpha)
      case "linear" => linearKernel(age, alpha)
      case other    => throw new IllegalArgumentException(s"unknown kernel $other")
    }
    log.withColumn(ratingCol, F.col(ratingCol) * w)
  }

  /** Decay-CALIBRATED weight column (the reference's actual public API,
    * `smoothe_time` time.py:114-254): the kernel constant is derived from
    * `decay` so that weight(decay days) == 0.5 exactly, and the weight is
    * floored at `limit`. Age is whole-seconds-based like the reference
    * (unix_timestamp truncation).
    *  - power:  (age+1) ^ (ln 0.5 / ln decay)
    *  - exp:    (e^(ln 0.5 / decay)) ^ age
    *  - linear: 1 − (0.5/decay)·age
    */
  private def calibratedWeight(ageDays: Column, decay: Double, limit: Double,
      kind: String): Column = {
    require(decay > 1, s"decay must be > 1, got $decay")
    val w = kind match {
      case "power"  => F.pow(ageDays + F.lit(1.0),
        F.lit(math.log(0.5) / math.log(decay)))
      case "exp"    => F.pow(F.lit(math.exp(math.log(0.5) / decay)), ageDays)
      case "linear" => F.lit(1.0) - F.lit(0.5 / decay) * ageDays
      case other    => throw new IllegalArgumentException(s"unknown kind $other")
    }
    F.when(w < limit, F.lit(limit)).otherwise(w)
  }

  /** Reference-exact `smoothe_time`: relevance *= calibrated weight.
    * The single max-timestamp driver action mirrors [[smooth]]. */
  def smoothCalibrated(log: DataFrame, decay: Double = 30.0,
      limit: Double = 0.1, kind: String = "exp",
      ratingCol: String = Rating, tsCol: String = Timestamp): DataFrame = {
    val lastSecs = log
      .agg(F.max(F.unix_timestamp(F.col(tsCol).cast("timestamp"))))
      .first().getLong(0)
    val age = (F.lit(lastSecs) - F.unix_timestamp(F.col(tsCol).cast("timestamp")))
      .cast("double") / F.lit(86400.0)
    log.withColumn(ratingCol,
      F.col(ratingCol) * calibratedWeight(age, decay, limit, kind))
  }

  /** Per-item recency weight (reference `get_item_recency`, time.py:10-111):
    * each item collapses to its MEAN interaction time (whole seconds,
    * floored like the reference's unix_timestamp round-trip), then the
    * calibrated kernel weighs it against the latest item mean. One
    * aggregation over the log; output has |items| rows
    * (item, timestamp, rating). */
  def itemRecency(log: DataFrame, decay: Double = 30.0, limit: Double = 0.1,
      kind: String = "exp", itemCol: String = ItemId,
      tsCol: String = Timestamp, ratingCol: String = Rating): DataFrame = {
    val items = log
      .select(F.col(itemCol),
        F.unix_timestamp(F.col(tsCol).cast("timestamp")).as("_s"))
      .groupBy(itemCol)
      .agg(F.floor(F.avg("_s")).cast("long").as("_secs"))
    val lastSecs = items.agg(F.max("_secs")).first().getLong(0)
    val age = (F.lit(lastSecs) - F.col("_secs")).cast("double") / F.lit(86400.0)
    items.select(F.col(itemCol),
      F.timestamp_seconds(F.col("_secs")).as(tsCol),
      calibratedWeight(age, decay, limit, kind).as(ratingCol))
  }
}
