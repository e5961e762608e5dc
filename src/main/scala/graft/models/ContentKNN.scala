package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.core.Ops

/** Content-based item KNN (engine extra — the reference's neighbour
  * family is purely collaborative; this is the COLD-ITEM complement: an
  * item never interacted with still has attributes, so it can both be
  * recommended and anchor "similar items" queries from day one).
  *
  * fit consumes a LONG-format item feature table (item, feature string) —
  * e.g. "brand:X", "type:Y", bucketed numerics — and builds
  *
  *   sim(i, j) = |F_i ∩ F_j| / (√|F_i| · √|F_j|)    (one-hot cosine)
  *
  * i.e. the ItemKNN cosine with features playing the role users play in
  * the collaborative model. The state is the same cropped
  * (item_one, item_two, similarity) table, so predict / predictPairs /
  * explain / getNearestItems all ride the [[NeighbourRec]] surface
  * unchanged — scoring a user = summing content similarities over their
  * history, the classic content-based fallback.
  *
  * Scale: the feature self-join is the hazard transposed once more — a
  * near-universal feature (every item shares "lang:en") contributes
  * |audience|² pairs. `maxFeatureAudience` caps each feature's
  * contribution to a deterministic pseudo-random item subset before the
  * join (the UserKNN discipline; the SQL oracles assume the cap does not
  * bind on gate data — drop universal features upstream, they carry no
  * signal and quadratic cost). Pair generation is upper-triangle then
  * symmetrized; the per-item crop bounds predict's fan-out. */
final class ContentKNN(
    val numNeighbours: Int = 10,
    val shrink: Double = 0.0,
    val maxFeatureAudience: Int = 1000,
    cols: RecCols = RecCols(),
) extends NeighbourRec(cols) {
  /** The (item, feature) table the similarities were built on. */
  var features: DataFrame = _

  protected def doFit(log: DataFrame): Unit =
    throw new UnsupportedOperationException(
      "ContentKNN fits on an item FEATURE table — call fitFeatures(features)")

  /** Build the content similarity state from (item, feature) rows. */
  def fitFeatures(feats: DataFrame): this.type = {
    val base = feats.select(F.col(cols.item), F.col("feature"))
      .distinct().cache()
    // r13 (guide §2.4): when the cap window is active it feeds norms + both
    // self-join sides — cache once instead of running it three times (the
    // uncapped branch is `base`, already cached).
    val capped = (if (maxFeatureAudience > 0) {
      val w = Window.partitionBy("feature").orderBy(
        F.xxhash64(F.col(cols.item), F.col("feature")),
        F.col(cols.item).asc)
      base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= maxFeatureAudience).drop("_rn")
    } else base).cache()
    val norms = capped.groupBy(cols.item)
      .agg(F.sqrt(F.count(F.lit(1)).cast("double")).as("_norm"))
    val l = capped.select(F.col("feature"), F.col(cols.item).as("item_one"))
    val r = capped.select(F.col("feature"), F.col(cols.item).as("item_two"))
    val dots = l.join(r, Seq("feature"))
      .filter(F.col("item_one") < F.col("item_two"))
      .groupBy("item_one", "item_two")
      .agg(F.count(F.lit(1)).cast("double").as("_dot"))
    // r13 (guide §2.4): `half` feeds both symmetrization branches — cached
    // so the feature-Gram join+aggregation runs once, released after crop.
    val half = dots
      .join(norms.withColumnRenamed(cols.item, "item_one")
        .withColumnRenamed("_norm", "_n1"), Seq("item_one"))
      .join(norms.withColumnRenamed(cols.item, "item_two")
        .withColumnRenamed("_norm", "_n2"), Seq("item_two"))
      .select(F.col("item_one"), F.col("item_two"),
        (F.col("_dot") / (F.col("_n1") * F.col("_n2") + F.lit(shrink)))
          .as("similarity"))
      .cache()
    val sym = half.unionByName(half.select(
      F.col("item_two").as("item_one"), F.col("item_one").as("item_two"),
      F.col("similarity")))
    materialize(Ops.getTopKRecsBounded(
      sym, numNeighbours, "item_one", "item_two", "similarity"))
    half.unpersist()
    if (capped ne base) capped.unpersist() // scratch; state = similarity+base
    features = base
    fitItemsDf = base.select(F.col(cols.item)).distinct().cache()
    this
  }

  /** Same knob ranges as the collaborative ItemKNN (knn.py:32-37):
    * neighbours integer [1, 100], shrink integer [0, 100]. */
  override def searchBorders: Map[String, (Double, Double)] = Map(
    "num_neighbours" -> (1.0, 100.0), "shrink" -> (0.0, 100.0))

  override def withParams(p: Map[String, Double]): ContentKNN = new ContentKNN(
    numNeighbours = p.get("num_neighbours").map(v => math.round(v).toInt)
      .getOrElse(numNeighbours),
    shrink = p.get("shrink").map(v => math.round(v).toDouble).getOrElse(shrink),
    maxFeatureAudience, cols)
}
