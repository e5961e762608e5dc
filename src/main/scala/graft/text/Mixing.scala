package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Domain mixing for training corpora: deterministically down-sample so
  * the per-source proportions hit a target mixture — the standard
  * "N% web, M% code, K% books" recipe applied before packing.
  *
  * Semantics: the output is the LARGEST corpus achievable at exactly the
  * target proportions — total T = min over sources of floor(n_s / p_s),
  * then floor(p_s · T) docs per source, chosen by portable-hash rank
  * (reproducible across cluster layouts AND in the DuckDB oracle).
  * Sources absent from `target` are dropped.
  *
  * Scale shape: one groupBy-count whose result is driver-bounded by the
  * number of SOURCES (a handful, vs billions of docs), then one
  * rank-window partitioned by source. At 100 TB the window sorts only
  * within each source partition — no global order anywhere.
  */
object Mixing {
  def sampleToMixture(docs: DataFrame, target: Map[String, Double],
      seed: Long = 7, idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target mixture must be non-empty with positive weights")
    require(math.abs(target.values.sum - 1.0) < 1e-9,
      s"target mixture must sum to 1, got ${target.values.sum}")
    // per-source counts: #sources rows — driver-bounded by design
    val counts = docs.groupBy(sourceCol).agg(F.count(F.lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = target.keySet -- counts.keySet
    require(missing.isEmpty, // fail fast, not a silently-empty corpus
      s"target sources absent from the corpus: ${missing.mkString(", ")}")
    val total = target.map { case (s, p) =>
      math.floor(counts(s) / p) }.min.toLong
    val limits = target.map { case (s, p) => s -> math.floor(p * total).toLong }
    val limCol = limits.foldLeft(F.lit(0L)) { case (acc, (s, n)) =>
      F.when(F.col(sourceCol) === s, F.lit(n)).otherwise(acc) }
    val w = Window.partitionBy(sourceCol).orderBy(
      graft.core.PortableHash.long(seed, F.col(idCol)), F.col(idCol).asc)
    docs.withColumn("_rn", F.row_number().over(w))
      .filter(F.col("_rn") <= limCol).drop("_rn")
  }
}
