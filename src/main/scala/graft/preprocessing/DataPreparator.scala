package graft.preprocessing

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.{NumericType, TimestampType}

/** Raw-input normalizer (reference:
  * replay/experimental/preprocessing/data_preparator.py:406-696
  * `DataPreparator`): read / rename to the canonical roles / default the
  * absent log columns / coerce types.
  *
  * `columnsMapping` maps canonical keys (`user_id`, `item_id`,
  * `timestamp`, `relevance`) to input column names. Both id keys present →
  * the frame is an interactions log: absent `relevance` defaults to 1.0
  * DOUBLE, absent `timestamp` to `defaultTs` (data_preparator.py:570-593),
  * `relevance` is cast DOUBLE and `timestamp` to TimestampType (numeric =
  * unix seconds, string parsed with `dateFormat` when given —
  * spark_utils.py:573-610). Exactly one id key → a feature frame: rename
  * only. All driver work is schema-sized; every transform is a projection.
  *
  * Deviation: the reference merely logs warnings for nulls in mapped
  * columns; `checkDf` here counts them only when `failOnNulls` is set
  * (opt-in, one scan), and empty/missing-column failures match the
  * reference's ValueErrors. */
final class DataPreparator(
    val defaultRelevance: Double = 1.0,
    val defaultTs: String = "2099-01-01",
    val failOnNulls: Boolean = false,
) extends Serializable {
  private val LogColumns = Set("user_id", "item_id", "timestamp", "relevance")

  /** File read path (data_preparator.py:479-514 `read_as_spark_df`). */
  def read(spark: SparkSession, path: String, formatType: String,
      options: Map[String, String] = Map.empty): DataFrame =
    formatType match {
      case "csv"     => spark.read.options(options).csv(path)
      case "parquet" => spark.read.options(options).parquet(path)
      case "json"    => spark.read.options(options).json(path)
      case "table"   => spark.table(path)
      case other => throw new IllegalArgumentException(
        s"format_type must be csv | parquet | json | table, got $other")
    }

  /** Validation (data_preparator.py:515-569 `check_df`). */
  def checkDf(df: DataFrame, columnsMapping: Map[String, String]): Unit = {
    require(df.head(1).nonEmpty, "DataFrame is empty")
    columnsMapping.values.foreach { c =>
      require(df.columns.contains(c),
        s"Column `$c` stated in mapping is absent in dataframe")
    }
    if (failOnNulls) {
      val nulls = df.select(columnsMapping.values.toSeq.distinct.map(c =>
        F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)).as(c)): _*).first()
      columnsMapping.values.toSeq.distinct.zipWithIndex.foreach { case (c, i) =>
        require(nulls.getLong(i) == 0L, s"Column `$c` has NULL values")
      }
    }
  }

  def transform(columnsMapping: Map[String, String], data: DataFrame,
      dateFormat: Option[String] = None): DataFrame = {
    val hasUser = columnsMapping.contains("user_id")
    val hasItem = columnsMapping.contains("item_id")
    require(hasUser || hasItem,
      "Mapping either for user ids or for item ids is not stated in `columns_mapping`")
    checkDf(data, columnsMapping)
    var df = columnsMapping.foldLeft(data) { case (d, (out, in)) =>
      if (d.columns.contains(in)) d.withColumnRenamed(in, out) else d
    }
    if (hasUser && hasItem) { // interactions log
      val absent = LogColumns -- columnsMapping.keySet
      if (absent.contains("relevance"))
        df = df.withColumn("relevance",
          F.lit(defaultRelevance).cast("double"))
      if (absent.contains("timestamp"))
        df = df.withColumn("timestamp", F.to_timestamp(F.lit(defaultTs)))
      df = df.withColumn("relevance", F.col("relevance").cast("double"))
      df = df.schema("timestamp").dataType match {
        case _: TimestampType => df
        case _: NumericType => df.withColumn("timestamp",
          F.to_timestamp(F.from_unixtime(F.col("timestamp"))))
        case _ => dateFormat match {
          case Some(fmt) => df.withColumn("timestamp",
            F.to_timestamp(F.col("timestamp"), fmt))
          case None => df.withColumn("timestamp",
            F.to_timestamp(F.col("timestamp")))
        }
      }
    }
    df
  }
}

/** One-hot encoder over saved category sets (reference:
  * data_preparator.py:684-725 `CatFeaturesTransformer`). Fit collects each
  * column's distinct values (driver state bounded by category cardinality);
  * transform appends one 0/1 column per (column, value) named
  * `<alias>_<col>_<sanitized value>` and drops the originals. Values unseen
  * at fit map to all-zeros, as the reference documents.
  *
  * Deviation: fit values are SORTED for a deterministic column order (the
  * reference inherits collect_set's nondeterministic order). */
final class CatFeaturesTransformer(
    val catColsList: Seq[String],
    val alias: String = "ohe",
) extends Serializable {
  /** (column → sorted distinct values), set by [[fit]]. */
  var categories: Map[String, Seq[String]] = Map.empty

  private def sanitize(v: String): String =
    v.filterNot(ch => ch.isWhitespace || !ch.isLetterOrDigit).take(30)

  def fit(df: DataFrame): this.type = {
    categories = catColsList.map { c =>
      c -> df.select(F.col(c).cast("string")).na.drop()
        .distinct().collect().map(_.getString(0)).sorted.toSeq
    }.toMap
    this
  }

  def transform(df: DataFrame): DataFrame = {
    require(categories.nonEmpty || catColsList.isEmpty,
      "CatFeaturesTransformer.transform before fit")
    val exprs = catColsList.flatMap { c =>
      categories(c).map { v =>
        F.when(F.col(c).cast("string") === v, 1).otherwise(0)
          .as(s"${alias}_${c}_${sanitize(v)}")
      }
    }
    df.select((df.columns.toIndexedSeq.map(F.col) ++ exprs): _*)
      .drop(catColsList: _*)
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}

/** Numeric-feature funnel (reference: data_preparator.py:727-830
  * `ToNumericFeatureTransformer`): numeric columns pass through; a
  * non-numeric column is one-hot encoded when its distinct count is within
  * `threshold`, dropped otherwise (threshold None → encode all).
  *
  * Deviation: exact `count_distinct` instead of the reference's
  * `approx_count_distinct` — deterministic gating at identical cost on the
  * one fit scan. */
final class ToNumericFeatureTransformer(
    val threshold: Option[Int] = Some(100),
    val idCols: Set[String] = Set("user_idx", "item_idx", "user_id",
      "item_id", "query_id"),
) extends Serializable {
  var colsToOhe: Seq[String] = Seq.empty
  var colsToDel: Seq[String] = Seq.empty
  var allColumns: Option[Seq[String]] = None
  var catTransformer: Option[CatFeaturesTransformer] = None
  private var fitted = false

  def fit(features: DataFrame): this.type = {
    fitted = true
    allColumns = Some(features.columns.sorted.toIndexedSeq)
    val nonNumeric = features.schema.fields.toIndexedSeq
      .filter(f => !f.dataType.isInstanceOf[NumericType] &&
        !idCols.contains(f.name)).map(_.name)
    threshold match {
      case None =>
        colsToOhe = nonNumeric; colsToDel = Seq.empty
      case Some(t) if nonNumeric.nonEmpty =>
        val counts = features.agg(
          F.countDistinct(F.col(nonNumeric.head)).as(nonNumeric.head),
          nonNumeric.tail.map(c => F.countDistinct(F.col(c)).as(c)): _*).first()
        colsToOhe = nonNumeric.zipWithIndex
          .filter { case (_, i) => counts.getLong(i) <= t }.map(_._1)
        colsToDel = nonNumeric.filterNot(colsToOhe.toSet)
      case _ =>
        colsToOhe = Seq.empty; colsToDel = Seq.empty
    }
    catTransformer =
      if (colsToOhe.nonEmpty)
        Some(new CatFeaturesTransformer(colsToOhe).fit(
          features.drop(colsToDel: _*)))
      else None
    this
  }

  def transform(df: DataFrame): DataFrame = {
    require(fitted, "Call fit before running transform")
    require(df.columns.sorted.toSeq == allColumns.get,
      s"Columns from fit do not match columns in transform: " +
        s"fit ${allColumns.get}, transform ${df.columns.toSeq}")
    catTransformer match {
      case None     => df.drop(colsToDel: _*)
      case Some(ct) => ct.transform(df.drop(colsToDel: _*))
    }
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}
