package graft.preprocessing

import org.apache.spark.sql.{DataFrame, functions => F}

/** Column discretization (reference: replay/preprocessing/discretizer.py).
  *
  * - Quantile rule (discretizer.py:376-601): bin edges from distributed
  *   quantiles (`approxQuantile`, relativeError tunable; 0.0 = exact), NaN
  *   handling keep/skip/error.
  * - Greedy rule (discretizer.py:63-374): LightGBM-style greedy binning over
  *   the value histogram. The histogram (distinct value → count) is computed
  *   distributed; only the distinct-value histogram is collected — bounded
  *   by `maxDistinct`, never the raw rows.
  *
  * Bucket assignment for both is a broadcast-friendly expression: with
  * sorted upper edges e_0..e_{n-2}, bin(x) = number of edges < x — no UDF,
  * stays inside codegen.
  */
sealed trait HandleInvalid
object HandleInvalid {
  case object Keep  extends HandleInvalid // NaN/null → extra bucket n
  case object Skip  extends HandleInvalid // drop rows
  case object Error extends HandleInvalid
}

final case class DiscretizerModel(column: String, edges: Array[Double],
    handleInvalid: HandleInvalid = HandleInvalid.Keep) {
  /** Adds `<column>_bucket`; bins are [edge_i, edge_{i+1}) with the last
    * bin closed on the right. */
  def transform(df: DataFrame): DataFrame = {
    val inner = edges.drop(1).dropRight(1) // internal cut points
    val x = F.col(column)
    val bucket = inner.foldLeft(F.lit(0)) { (acc, e) =>
      acc + F.when(x >= e, 1).otherwise(0)
    }
    val invalid = x.isNull || F.isnan(x)
    handleInvalid match {
      case HandleInvalid.Keep =>
        df.withColumn(s"${column}_bucket",
          F.when(invalid, F.lit(edges.length - 1)).otherwise(bucket).cast("long"))
      case HandleInvalid.Skip =>
        df.filter(!invalid).withColumn(s"${column}_bucket", bucket.cast("long"))
      case HandleInvalid.Error =>
        val bad = df.filter(invalid).count()
        if (bad > 0)
          throw new IllegalArgumentException(
            s"$bad NaN/null values in '$column' with handleInvalid=Error")
        df.withColumn(s"${column}_bucket", bucket.cast("long"))
    }
  }
}

object Discretizer {
  /** Quantile binning: edges at i/n quantiles. relativeError=0 uses the
    * exact interpolated percentile (one distributed aggregation, ANSI
    * `percentile_cont` semantics); >0 uses Greenwald–Khanna sketches. */
  def fitQuantile(df: DataFrame, column: String, nBuckets: Int,
      relativeError: Double = 0.0,
      handleInvalid: HandleInvalid = HandleInvalid.Keep): DiscretizerModel = {
    val probes = (0 to nBuckets).map(_.toDouble / nBuckets).toArray
    val valid = df.filter(!F.isnan(F.col(column)) && F.col(column).isNotNull)
    val qs =
      if (relativeError == 0.0) {
        // percentile over zero valid rows aggregates to NULL — degrade to
        // the empty edge set like the sketch path does
        val row = valid.agg(F.percentile(F.col(column), F.lit(probes)).as("q")).first()
        if (row.isNullAt(0)) Array.empty[Double]
        else row.getAs[scala.collection.Seq[Double]](0).toArray
      } else valid.stat.approxQuantile(column, probes, relativeError)
    DiscretizerModel(column, qs.distinct.sorted, handleInvalid)
  }

  /** Greedy binning on the value histogram (discretizer.py:192-263):
    * target equal-weight bins walked greedily over sorted distinct values.
    * If the column's cardinality exceeds `maxDistinct` the full histogram
    * cannot be collected — rather than silently truncating the upper tail,
    * fall back to quantile edges (which stay distributed). */
  def fitGreedy(df: DataFrame, column: String, nBuckets: Int,
      maxDistinct: Int = 100000,
      handleInvalid: HandleInvalid = HandleInvalid.Keep): DiscretizerModel = {
    val valid = df.filter(!F.isnan(F.col(column)) && F.col(column).isNotNull)
    val nDistinct = valid.select(column).distinct().count()
    if (nDistinct > maxDistinct)
      return fitQuantile(df, column, nBuckets,
        relativeError = 1.0 / (4.0 * nBuckets), handleInvalid = handleInvalid)
    val hist = valid
      .groupBy(column).agg(F.count(F.lit(1)).as("_c"))
      .orderBy(column)
      .collect().map(r => (r.getAs[Number](0).doubleValue(), r.getLong(1)))
    require(hist.nonEmpty, s"no valid values in $column")
    val total = hist.map(_._2).sum
    val perBin = total.toDouble / nBuckets
    // multiplicative bin target (j-th edge at the first value whose cumsum
    // reaches j·perBin, never before the previous edge) — equivalent to the
    // accumulating walk but with a float-exact closed form
    val edges = scala.collection.mutable.ArrayBuffer[Double](hist.head._1)
    var acc = 0L
    hist.foreach { case (v, c) =>
      acc += c
      if (acc >= perBin * edges.length && edges.length < nBuckets)
        edges += v
    }
    edges += hist.last._1
    DiscretizerModel(column, edges.distinct.sorted.toArray, handleInvalid)
  }
}
