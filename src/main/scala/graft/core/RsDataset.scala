package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** The engine's core data object: interaction log + optional per-query and
  * per-item feature tables sharing one FeatureSchema.
  *
  * Semantics from the reference `Dataset` (replay/data/dataset.py:33-748):
  * a single Spark `DataFrame` backend replaces the pandas/polars/spark triple.
  * Consistency checks are anti-join counts (dataset.py:559-599); the
  * "encoded" invariant (ids integral in [0, cardinality)) is a min/max
  * aggregate check (dataset.py:601-659). Persistence is parquet per table
  * plus a JSON sidecar (dataset.py:209-345).
  */
final case class RsDataset(
    interactions: DataFrame,
    queryFeatures: Option[DataFrame] = None,
    itemFeatures: Option[DataFrame] = None,
    schema: FeatureSchema = FeatureSchema.canonical,
) {
  def queryColumn: String  = schema.queryIdColumn.getOrElse(FeatureSchema.QueryId)
  def itemColumn: String   = schema.itemIdColumn.getOrElse(FeatureSchema.ItemId)
  def ratingColumn: Option[String]    = schema.ratingColumn
  def timestampColumn: Option[String] = schema.timestampColumn

  /** ids present in interactions but absent from a feature table — must be 0
    * for a consistent dataset (reference: dataset.py:559-599, left_anti). */
  def inconsistentIds: Map[String, Long] = {
    def check(feat: Option[DataFrame], col: String): Option[(String, Long)] =
      feat.map { f => col -> Ops.coldCount(interactions, f, col) }
    (check(queryFeatures, queryColumn) ++ check(itemFeatures, itemColumn)).toMap
  }

  /** Encoded invariant: both id columns integral and within [0, max]
    * (reference: dataset.py:601-659 — min/max aggregates, no full scan twice). */
  def checkEncoded(): Boolean = {
    import org.apache.spark.sql.types._
    val integral = Seq(queryColumn, itemColumn).forall { c =>
      interactions.schema(c).dataType match {
        case IntegerType | LongType | ShortType => true
        case _                                  => false
      }
    }
    if (!integral) return false
    val r = interactions.agg(
      F.min(queryColumn), F.min(itemColumn)).first()
    !r.isNullAt(0) && r.getAs[Number](0).longValue() >= 0L &&
      r.getAs[Number](1).longValue() >= 0L
  }

  /** Basic log statistics string (reference `get_log_info`,
    * spark_utils.py:325-359) — one aggregate job instead of the
    * reference's three separate scans. */
  def logInfo: String = {
    val r = interactions.agg(
      F.count(F.lit(1)), F.countDistinct(F.col(queryColumn)),
      F.countDistinct(F.col(itemColumn))).first()
    s"total lines: ${r.getLong(0)}, total users: ${r.getLong(1)}, " +
      s"total items: ${r.getLong(2)}"
  }

  def queryCount: Long = interactions.select(queryColumn).distinct().count()
  def itemCount: Long = interactions.select(itemColumn).distinct().count()

  /** Feature-subset projection (reference `Dataset.subset`,
    * dataset.py:397-440): the id columns survive even when not listed;
    * each table keeps only the surviving columns it actually has.
    * Pure projection — no consistency re-check needed, column values are
    * untouched (the reference skips it for the same reason). */
  def subset(featuresToKeep: Iterable[String]): RsDataset = {
    val keep = featuresToKeep.toSet + queryColumn + itemColumn
    def proj(df: DataFrame): DataFrame =
      df.select(df.columns.filter(keep.contains).map(F.col).toSeq: _*)
    copy(
      interactions = proj(interactions),
      queryFeatures = queryFeatures.map(proj),
      itemFeatures = itemFeatures.map(proj))
  }

  def cache(): RsDataset = {
    interactions.cache(); queryFeatures.foreach(_.cache()); itemFeatures.foreach(_.cache())
    this
  }
  def unpersist(): RsDataset = {
    interactions.unpersist(); queryFeatures.foreach(_.unpersist()); itemFeatures.foreach(_.unpersist())
    this
  }

  /** Parquet per table (order-preserved via an idx column,
    * reference dataset.py:209-229) + minimal JSON sidecar. */
  def save(path: String): Unit = {
    def write(df: DataFrame, name: String): Unit =
      df.withColumn("_idx", F.monotonically_increasing_id())
        .write.mode("overwrite").parquet(s"$path/$name")
    write(interactions, "interactions")
    queryFeatures.foreach(write(_, "query_features"))
    itemFeatures.foreach(write(_, "item_features"))
    val sidecar =
      s"""{"query_column":"$queryColumn","item_column":"$itemColumn",
         |"has_query_features":${queryFeatures.isDefined},
         |"has_item_features":${itemFeatures.isDefined}}""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$path/init_args.json"), sidecar)
  }
}

object RsDataset {
  /** Order-restoring load (reference dataset.py:231-258: orderBy idx, drop). */
  def load(spark: SparkSession, path: String, schema: FeatureSchema = FeatureSchema.canonical): RsDataset = {
    def read(name: String): Option[DataFrame] = {
      val p = java.nio.file.Paths.get(s"$path/$name")
      if (java.nio.file.Files.exists(p))
        Some(spark.read.parquet(s"$path/$name").orderBy("_idx").drop("_idx"))
      else None
    }
    RsDataset(
      interactions = read("interactions").getOrElse(
        throw new IllegalArgumentException(s"no interactions table under $path")),
      queryFeatures = read("query_features"),
      itemFeatures = read("item_features"),
      schema = schema,
    )
  }
}
