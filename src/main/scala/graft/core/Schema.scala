package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Feature-role schema system.
  *
  * Semantics follow the reference's FeatureType/FeatureSource/FeatureHint and
  * FeatureInfo/FeatureSchema (reference: replay/data/schema.py:5-28, 31-116,
  * 119-466) re-expressed as immutable Scala values validated against Spark
  * `StructType`s instead of a Python class hierarchy.
  */
sealed trait FeatureType
object FeatureType {
  case object Categorical     extends FeatureType
  case object CategoricalList extends FeatureType
  case object Numerical       extends FeatureType
  case object NumericalList   extends FeatureType
}

sealed trait FeatureSource
object FeatureSource {
  case object ItemFeatures  extends FeatureSource
  case object QueryFeatures extends FeatureSource
  case object Interactions  extends FeatureSource
}

/** Role annotations models read instead of hard-coded column names
  * (reference: replay/data/schema.py:22-28, base_rec.py:110-113). */
sealed trait FeatureHint
object FeatureHint {
  case object ItemId    extends FeatureHint
  case object QueryId   extends FeatureHint
  case object Rating    extends FeatureHint
  case object Timestamp extends FeatureHint
}

final case class FeatureInfo(
    columnName: String,
    featureType: FeatureType,
    source: FeatureSource = FeatureSource.Interactions,
    hint: Option[FeatureHint] = None,
    cardinality: Option[Long] = None,
) {
  def isList: Boolean = featureType match {
    case FeatureType.CategoricalList | FeatureType.NumericalList => true
    case _                                                       => false
  }
  def isCategorical: Boolean = featureType match {
    case FeatureType.Categorical | FeatureType.CategoricalList => true
    case _                                                     => false
  }
}

/** Immutable collection of FeatureInfo with the reference's filter/subset
  * algebra (replay/data/schema.py:335-399, 143-155, 215-216). */
final case class FeatureSchema(features: Seq[FeatureInfo]) {
  def columns: Seq[String] = features.map(_.columnName)

  def get(name: String): Option[FeatureInfo] = features.find(_.columnName == name)

  def filter(
      name: Option[String] = None,
      featureType: Option[FeatureType] = None,
      source: Option[FeatureSource] = None,
      hint: Option[FeatureHint] = None,
  ): FeatureSchema = FeatureSchema(features.filter { f =>
    name.forall(_ == f.columnName) &&
    featureType.forall(_ == f.featureType) &&
    source.forall(_ == f.source) &&
    hint.forall(h => f.hint.contains(h))
  })

  def drop(
      name: Option[String] = None,
      featureType: Option[FeatureType] = None,
      source: Option[FeatureSource] = None,
      hint: Option[FeatureHint] = None,
  ): FeatureSchema = FeatureSchema(features.filterNot { f =>
    name.exists(_ == f.columnName) ||
    featureType.exists(_ == f.featureType) ||
    source.exists(_ == f.source) ||
    hint.exists(h => f.hint.contains(h))
  })

  def subset(names: Set[String]): FeatureSchema =
    FeatureSchema(features.filter(f => names.contains(f.columnName)))

  def ++(other: FeatureSchema): FeatureSchema = FeatureSchema(features ++ other.features)

  def queryIdColumn: Option[String]   = hintCol(FeatureHint.QueryId)
  def itemIdColumn: Option[String]    = hintCol(FeatureHint.ItemId)
  def ratingColumn: Option[String]    = hintCol(FeatureHint.Rating)
  def timestampColumn: Option[String] = hintCol(FeatureHint.Timestamp)
  private def hintCol(h: FeatureHint): Option[String] =
    features.find(_.hint.contains(h)).map(_.columnName)

  /** Check declared feature types against a physical Spark schema.
    * List types must be ArrayType; ids must be integral once encoded. */
  def validate(physical: StructType): Seq[String] = {
    val byName = physical.fields.map(f => f.name -> f.dataType).toMap
    features.flatMap { f =>
      byName.get(f.columnName) match {
        case None => Seq(s"column '${f.columnName}' missing from physical schema")
        case Some(dt) =>
          val bad = (f.featureType, dt) match {
            case (FeatureType.CategoricalList | FeatureType.NumericalList, _: ArrayType) => false
            case (FeatureType.CategoricalList | FeatureType.NumericalList, _)            => true
            case _                                                                       => false
          }
          if (bad) Seq(s"column '${f.columnName}' declared list but physical type is $dt")
          else Nil
      }
    }
  }
}

object FeatureSchema {
  val QueryId   = "query_id"
  val ItemId    = "item_id"
  val Timestamp = "timestamp"
  val Rating    = "rating"

  /** Canonical interaction schema (reference: replay/data/spark_schema.py:7-33):
    * ids are integral after encoding; LongType here (100TB-scale id space). */
  def canonical: FeatureSchema = FeatureSchema(Seq(
    FeatureInfo(QueryId, FeatureType.Categorical, hint = Some(FeatureHint.QueryId)),
    FeatureInfo(ItemId, FeatureType.Categorical, hint = Some(FeatureHint.ItemId)),
    FeatureInfo(Timestamp, FeatureType.Numerical, hint = Some(FeatureHint.Timestamp)),
    FeatureInfo(Rating, FeatureType.Numerical, hint = Some(FeatureHint.Rating)),
  ))

  /** Unlabeled columns inferred as NUMERICAL (reference: dataset.py:483-512). */
  def infer(df: DataFrame, source: FeatureSource): FeatureSchema = FeatureSchema(
    df.schema.fields.toSeq.map { f =>
      val tpe = f.dataType match {
        case _: ArrayType                 => FeatureType.NumericalList
        case StringType                   => FeatureType.Categorical
        case _                            => FeatureType.Numerical
      }
      FeatureInfo(f.name, tpe, source)
    }
  )
}
