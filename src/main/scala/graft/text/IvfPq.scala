package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.core.Ops

/** IVF-PQ composite index (Jégou et al. 2011 §IV "IVFADC" — the shape
  * FAISS ships as `IndexIVFPQ`, and the standard answer at corpus scales
  * where even the PQ code table should not be scanned in full).
  *
  * Composition over the two indexes this engine already has:
  *  - [[IvfIndex]] is the coarse quantizer: seeded KMeans centroids,
  *    vectors assigned to inverted lists (argmin squared Euclidean, ties
  *    to the lowest centroid — probe rule == assignment rule, the r6
  *    lesson baked into IvfIndex itself);
  *  - [[PqIndex]] codebooks are trained on the RESIDUALS `v − c(v)` (not
  *    the raw vectors — residuals concentrate around 0 with far less
  *    variance, so the same M×K codebook budget spends its resolution
  *    where the data actually is; this is what separates IVFADC from
  *    IVF + independent PQ);
  *  - search probes `nProbe` cells per query and runs the asymmetric-
  *    distance scan ONLY over the probed cells' codes: per (query, cell)
  *    the query residual `q − c` yields an M×K lookup table, the probed
  *    codes join it on (cell, subspace, code), and the approximate dot is
  *    `q·c + Σ_m lut[m][code_m]` — exactly `q·(c + decode(codes))`;
  *  - a bounded top-R crop (O(R) heap state, no sort) feeds the exact
  *    cosine re-rank against the raw vectors, restoring brute-force score
  *    parity on everything the crop kept.
  *
  * Scan cost vs the flat [[PqIndex]]: the ADC join touches
  * |Q|·(nProbe/nCentroids)·|N|·M rows instead of |Q|·|N|·M — the
  * inverted-file fraction multiplies with PQ's d/M compression. Nothing
  * is collected beyond the two centroid tables (nCentroids + M·K rows,
  * both broadcast); codes, assignments and re-rank joins are all
  * DataFrame ops, so the index scales with the cluster, not the driver.
  */
final class IvfPqIndex(
    val nCentroids: Int = 16,
    val nProbe: Int = 4,
    val numSubspaces: Int = 8,
    val codebookSize: Int = 16,
    val seed: Long = 42,
    val idCol: String = "vec_id",
    val vecCol: String = "embedding",
    val trainFraction: Double = 1.0,
) extends Serializable {

  var ivf: IvfIndex = _
  var pq: PqIndex = _
  /** (id, _centroid, _codes) — the inverted file of PQ-coded residuals. */
  var cells: DataFrame = _
  private var raw: DataFrame = _ // (id, vec) original vectors for re-rank

  private def dvec(c: org.apache.spark.sql.Column) =
    F.transform(c, x => x.cast("double"))

  def fit(vectors: DataFrame): this.type = {
    raw = vectors.select(F.col(idCol), F.col(vecCol)).cache()
    ivf = new IvfIndex(nCentroids, nProbe, seed, idCol, vecCol).fit(raw)
    val residuals = ivf.assigned
      .join(F.broadcast(ivf.centroidFrame), Seq("_centroid"))
      .select(F.col(idCol),
        F.zip_with(dvec(F.col(vecCol)), F.col("_cvec"),
          (x, y) => x - y).as(vecCol))
    pq = new PqIndex(numSubspaces, codebookSize, seed, idCol, vecCol,
      trainFraction).fit(residuals)
    cells = pq.codes
      .join(ivf.assigned.select(F.col(idCol), F.col("_centroid")), Seq(idCol))
      .cache()
    cells.count()
    this
  }

  /** Probed-cell ADC approximate dot scores, cropped to the top `r` per
    * query with the bounded heap — the composable stage 1 ([[IvfPqAnn]]
    * re-scores with the exact dot; [[search]] with the exact cosine).
    * Output: (queryIdCol, idCol, _approx). */
  private[graft] def adcTopR(queries: DataFrame, queryIdCol: String,
      r: Int, excludeSelf: Boolean): DataFrame = {
    require(queryIdCol != idCol,
      s"query id column must differ from the item id column ($idCol)")
    val dsub = pq.subDim
    val q = queries.select(F.col(queryIdCol), F.col(vecCol).as("_qv"))
    // probe rule == assignment rule: argmin squared Euclidean over the
    // broadcast centroid table, ties to the lowest centroid id
    val sqDistQ = F.aggregate(
      F.zip_with(dvec(F.col("_qv")), F.col("_cvec"), (x, y) => (x - y) * (x - y)),
      F.lit(0.0), (acc, v) => acc + v)
    val probed = q.crossJoin(F.broadcast(ivf.centroidFrame))
      .withColumn("_d", sqDistQ)
      .withColumn("_rn", F.row_number().over(Window.partitionBy(queryIdCol)
        .orderBy(F.col("_d").asc, F.col("_centroid").asc)))
      .filter(F.col("_rn") <= nProbe)
      .select(F.col(queryIdCol), F.col("_centroid"),
        F.zip_with(dvec(F.col("_qv")), F.col("_cvec"), (x, y) => x - y).as("_qr"),
        Similarity.dot(dvec(F.col("_qv")), F.col("_cvec")).as("_qcdot"))
    // per-(query, probed cell) M×K residual lookup table
    val lut = probed.crossJoin(F.broadcast(pq.codewordFrame))
      .select(F.col(queryIdCol), F.col("_centroid"), F.col("_qcdot"),
        F.col("_m"), F.col("_code"),
        Similarity.dot(
          F.slice(F.col("_qr"), F.col("_m") * dsub + 1, F.lit(dsub)),
          F.col("_cvec")).as("_lut"))
    // ADC over the probed cells only: codes join the LUT on the cell id
    // too, so unprobed inverted lists never enter the scan
    val exploded = cells.select(F.col(idCol), F.col("_centroid"),
      F.posexplode(F.col("_codes")).as(Seq("_m", "_code")))
    exploded.join(lut, Seq("_centroid", "_m", "_code"))
      .filter(if (excludeSelf) F.col(queryIdCol) =!= F.col(idCol) else F.lit(true))
      .groupBy(queryIdCol, idCol)
      // an item lives in exactly one cell → one _qcdot per (query, item)
      .agg((F.sum("_lut") + F.first("_qcdot")).as("_approx"))
      .transform(a => Ops.getTopKRecsBounded(a, r, queryIdCol, idCol, "_approx"))
  }

  /** Top-k cosine neighbors, self-match excluded; output matches
    * `IvfIndex.search` / `PqIndex.search`:
    * (query_id, neighbor_id, cosine, rank). `rerank·k` is the exact-
    * re-rank pool — size it with [[PqIndex.rerankFor]] scaled by the
    * probed fraction (the pool needs to cover the probed cells' share of
    * the corpus, not the whole corpus). */
  def search(queries: DataFrame, k: Int, rerank: Int = 4): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("_qv"))
    val cand = adcTopR(queries.select(F.col(idCol).as("query_id"), F.col(vecCol)),
      "query_id", rerank * k, excludeSelf = true)
    val scored = cand
      .join(raw.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("_cv")),
        F.col(idCol) === F.col("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        Similarity.cosine(F.col("_qv"), F.col("_cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
  }

  /** Raw item vectors (id, vec) — [[IvfPqAnn]] re-scores against these. */
  private[graft] def rawVectors: DataFrame = raw
}
