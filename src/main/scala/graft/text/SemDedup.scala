package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** SemDeDup — semantic (embedding-space) deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"). The LAION/web-corpus recipe: KMeans-cluster the
  * embeddings, call two documents semantic duplicates when their cosine
  * similarity inside a cluster exceeds `tau`, and keep exactly one
  * representative per duplicate group — the one with the LOWEST similarity
  * to its cluster centroid (the paper's keep-hard-examples rule).
  *
  * The within-cluster formulation is what makes the O(n²) pairwise matrix
  * tractable: pairs are only formed inside a cluster, so the join cost is
  * Σ|c|² — `nClusters` is the knob (the paper uses ~50k clusters at
  * web scale; [[clusterStats]] audits the actual pair count before a big
  * run, the same pre-flight contract as `Similarity.lshCandidateStats`).
  *
  * Deterministic keep rule, matching the released SemDeDup implementation's
  * triangular-max formulation: within a cluster, order documents
  * farthest-from-centroid FIRST (squared-Euclidean distance descending,
  * ties on id ascending) and drop a document iff some EARLIER-ranked
  * document is `>= tau`-similar to it. The farthest member of every
  * duplicate group survives; identical vectors keep the lowest id.
  *
  * Spark shape: one seeded KMeans fit (reused from [[IvfIndex]] — probe
  * rule == assignment rule, ties to the lowest centroid), one broadcast
  * centroid join for the ranks, ONE within-cluster equi-join for the
  * pairs, one groupBy for the verdicts. Nothing driver-side beyond the
  * centroid table.
  */
object SemDedup {

  /** Per-document verdict frame:
    * (idCol, cluster, crank, max_prior_cos, keep) — `crank` is the
    * 1-based farthest-first canonical rank inside the cluster,
    * `max_prior_cos` the best similarity to any earlier-ranked clustermate
    * (−1.0 when none reaches `tau`), `keep = max_prior_cos < tau`. */
  def verdicts(vectors: DataFrame, nClusters: Int, tau: Double,
      seed: Long = 42, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val (assigned, centroidFrame) =
      assignedAndCentroids(vectors, nClusters, seed, idCol, vecCol)
    val sqDist = F.aggregate(
      F.zip_with(F.transform(F.col(vecCol), x => x.cast("double")),
        F.col("_cvec"), (x, y) => (x - y) * (x - y)),
      F.lit(0.0), (acc, v) => acc + v)
    val ranked = assigned
      .join(F.broadcast(centroidFrame), Seq("_centroid"))
      .withColumn("_dc", sqDist)
      .withColumn("_crank", F.row_number().over(
        Window.partitionBy("_centroid")
          .orderBy(F.col("_dc").desc, F.col(idCol).asc)).cast("long"))
      .select(F.col(idCol), F.col(vecCol), F.col("_centroid"), F.col("_crank"))
      .cache()
    val a = ranked.select(F.col(idCol).as("_aid"), F.col(vecCol).as("_av"),
      F.col("_centroid"), F.col("_crank").as("_arank"))
    val b = ranked.select(F.col(idCol).as("_bid"), F.col(vecCol).as("_bv"),
      F.col("_centroid"), F.col("_crank").as("_brank"))
    // the Σ|c|² step: within-cluster upper-triangle pairs only
    val dropped = a.join(b, Seq("_centroid"))
      .filter(F.col("_arank") < F.col("_brank"))
      .select(F.col("_bid"),
        Similarity.cosine(F.col("_av"), F.col("_bv")).as("_cos"))
      .filter(F.col("_cos") >= tau)
      .groupBy("_bid").agg(F.max("_cos").as("_maxcos"))
    ranked
      .join(dropped, F.col(idCol) === F.col("_bid"), "left")
      .select(F.col(idCol),
        F.col("_centroid").cast("long").as("cluster"),
        F.col("_crank").as("crank"),
        F.coalesce(F.col("_maxcos"), F.lit(-1.0)).as("max_prior_cos"),
        (F.coalesce(F.col("_maxcos"), F.lit(-1.0)) < tau).as("keep"))
  }

  /** The deduplicated corpus: input rows whose verdict is `keep`. */
  def dedup(vectors: DataFrame, nClusters: Int, tau: Double,
      seed: Long = 42, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.join(
      verdicts(vectors, nClusters, tau, seed, idCol, vecCol)
        .filter(F.col("keep")).select(idCol),
      Seq(idCol), "left_semi")

  /** Cluster assignment + centroid table. MLlib KMeans floors k at 2, so
    * the degenerate single-cluster config (useful for tests and tiny
    * corpora) computes the one centroid — the global mean — directly:
    * a posexplode per-dimension average, d driver-side values (the same
    * bounded state a KMeans centroid table holds). */
  private def assignedAndCentroids(vectors: DataFrame, nClusters: Int,
      seed: Long, idCol: String, vecCol: String): (DataFrame, DataFrame) = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    if (nClusters == 1) {
      val mean = vectors
        .select(F.posexplode(F.transform(F.col(vecCol), x => x.cast("double")))
          .as(Seq("_i", "_x")))
        .groupBy("_i").agg(F.avg("_x").as("_m"))
        .orderBy("_i").collect().map(_.getDouble(1))
      val centroidFrame = vectors.sparkSession
        .createDataFrame(Seq((0, mean.toSeq))).toDF("_centroid", "_cvec")
      (vectors.select(F.col(idCol), F.col(vecCol), F.lit(0).as("_centroid")),
        centroidFrame)
    } else {
      val ivf = new IvfIndex(nClusters, 1, seed, idCol, vecCol).fit(vectors)
      (ivf.assigned, ivf.centroidFrame)
    }
  }

  /** Pre-flight cost audit (run before committing `nClusters` to a large
    * corpus): per-cluster occupancy and the pair count the dedup join
    * will materialize — Σ|c|·(|c|−1)/2 over clusters. One KMeans fit +
    * one aggregation. */
  def clusterStats(vectors: DataFrame, nClusters: Int, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ivf = new IvfIndex(nClusters, 1, seed, idCol, vecCol).fit(vectors)
    ivf.assigned.groupBy(F.col("_centroid").cast("long").as("cluster"))
      .agg(F.count(F.lit(1)).as("size"))
      .withColumn("pairs",
        (F.col("size") * (F.col("size") - 1) / 2).cast("long"))
  }
}
