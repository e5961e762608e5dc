package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.core.Ops

/** Product-quantization index (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the standard compressed-scan
  * ANN shape at corpus scales where raw float vectors no longer fit).
  *
  * Fit splits each d-dim vector into `numSubspaces` contiguous
  * sub-vectors and trains one seeded KMeans codebook of `codebookSize`
  * codewords per subspace (a driver loop bounded by numSubspaces — each
  * fit is fully distributed). A vector is stored as its M nearest-codeword
  * ids: d·4 bytes become M small ints (32× at d=64, M=8 when codes pack
  * to bytes).
  *
  * Search is two-stage, all joins:
  *  1. ADC (asymmetric distance) scan: the query stays full-precision;
  *     per query a broadcast |M·K| lookup table of sub-dot-products is
  *     built, and the compressed code table joins it on (subspace, code)
  *     — |Q|·|N|·M join rows against the d/M-times-smaller code table,
  *     then a bounded top-R crop (`Ops.getTopKRecsBounded`, O(R) state).
  *  2. Exact re-rank: only the R surviving candidates rejoin their raw
  *     vectors for the exact cosine, restoring brute-force score parity
  *     on everything the crop kept.
  *
  * Assignment ties break to the lowest code id (KMeans's own rule), so
  * encoding is deterministic given the codebooks. Like the reference's
  * hnswlib extension (replay/models/extensions/ann) this trades recall
  * for scan cost; unlike it, nothing lives outside Spark — the "index"
  * is a DataFrame of codes.
  */
object PqIndex {
  /** Re-rank pool size calibrated to the ≥0.95 recall@5 contract on an
    * UNSTRUCTURED corpus: max(48, ⌈0.06·n⌉) — 48 at the 500-vector gate
    * corpus (≥95%), 120 at 2000 (98% measured; the fixed 48 fell to 90%
    * in the r8 10× audit). Coarse M×2^b codebooks quantize an
    * unstructured corpus into wide ADC distance shells, so the covering
    * pool is a constant FRACTION of the corpus, not a constant count —
    * the ADC scan stays d/M× lighter than brute force regardless.
    * Clustered corpora need far less (TextSpec cluster-granular crop). */
  def rerankFor(n: Long): Int =
    math.max(48, math.ceil(0.06 * n).toInt)
}

final class PqIndex(
    val numSubspaces: Int = 8,
    val codebookSize: Int = 16,
    val seed: Long = 42,
    val idCol: String = "vec_id",
    val vecCol: String = "embedding",
    /** Codebook-training sample fraction. Codebooks need a representative
      * sample, not the corpus — at 10⁹ vectors full-corpus KMeans×M is
      * the bottleneck; ~10⁵-10⁶ sampled rows train the same centroids.
      * Encoding always covers every vector. Seeded, so still
      * deterministic. */
    val trainFraction: Double = 1.0,
) extends Serializable {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector

  var codebooks: Array[Array[Array[Double]]] = _ // [subspace][code][dsub]
  var codes: DataFrame = _                       // (id, _codes array<int>)
  private[text] var raw: DataFrame = _           // (id, vec) for re-rank
  private var dsub: Int = _
  /** Sub-vector width d/M — composite indexes (IVF-PQ) build their own
    * residual-space lookup tables from the fitted codebooks. */
  private[text] def subDim: Int = dsub

  private def dvec(c: org.apache.spark.sql.Column) =
    F.transform(c, x => x.cast("double"))

  /** (_m, _code, _cvec) — numSubspaces·codebookSize rows, always broadcast. */
  def codewordFrame: DataFrame = {
    val rows = for {
      (cb, m) <- codebooks.zipWithIndex.toSeq
      (c, code) <- cb.zipWithIndex
    } yield (m, code, c)
    raw.sparkSession.createDataFrame(rows).toDF("_m", "_code", "_cvec")
  }

  def fit(vectors: DataFrame): this.type = {
    val d = vectors.select(F.size(F.col(vecCol))).first().getInt(0)
    require(d % numSubspaces == 0,
      s"dim $d not divisible into $numSubspaces subspaces")
    dsub = d / numSubspaces
    raw = vectors.select(F.col(idCol), F.col(vecCol)).cache()
    val trainSet =
      if (trainFraction >= 1.0) raw
      else raw.sample(withReplacement = false, trainFraction, seed).cache()
    // The M per-subspace KMeans fits are independent distributed jobs —
    // submit them CONCURRENTLY (Spark's fair scheduler interleaves their
    // stages) instead of serializing M driver-blocking fits: each fit
    // underutilizes the cluster at the tails (driver-side init/aggregation
    // barriers), so wall-clock ≈ max instead of sum. Determinism is
    // untouched: each fit is independently seeded (seed + m) and KMeans
    // results don't depend on what else is running.
    // materialize the shared cache ONCE (not M times racing), then compact
    // the usually-small sampled training set so each of the M fits' ~20
    // iteration-jobs schedules a handful of real tasks, not 32 micro-tasks
    val nTrain = trainSet.count()
    val trainCompact = graft.core.Ops.compactForIterativeFit(trainSet, nTrain)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    codebooks = Await.result(
      Future.sequence((0 until numSubspaces).map { m => Future {
        val withVec = trainCompact.withColumn("_features",
          array_to_vector(F.slice(dvec(F.col(vecCol)), m * dsub + 1, dsub)))
        new KMeans().setK(codebookSize).setSeed(seed + m)
          .setFeaturesCol("_features").setPredictionCol("_c")
          .fit(withVec).clusterCenters.map(_.toArray)
      }}.toSeq),
      Duration.Inf).toArray
    codes = encode(raw).cache()
    codes.count()
    this
  }

  /** Nearest-codeword assignment per subspace, one distributed pass:
    * sub-vectors posexplode against the broadcast codeword table, argmin
    * squared distance (ties → lowest code), regrouped in subspace order. */
  private def encode(vectors: DataFrame): DataFrame = {
    val subs = F.array((0 until numSubspaces).map(m =>
      F.slice(dvec(F.col(vecCol)), m * dsub + 1, dsub)): _*)
    val sqDist = F.aggregate(
      F.zip_with(F.col("_sub"), F.col("_cvec"), (x, y) => (x - y) * (x - y)),
      F.lit(0d), (acc, v) => acc + v)
    vectors.select(F.col(idCol), F.posexplode(subs).as(Seq("_m", "_sub")))
      .join(F.broadcast(codewordFrame), Seq("_m"))
      .withColumn("_d", sqDist)
      .withColumn("_rn", F.row_number().over(Window.partitionBy(idCol, "_m")
        .orderBy(F.col("_d").asc, F.col("_code").asc)))
      .filter(F.col("_rn") === 1)
      .groupBy(idCol)
      .agg(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_m"), F.col("_code")))),
        s => s.getField("_code")).as("_codes"))
  }

  /** Stage 1: ADC dot-product approximation, cropped to the top `r` items
    * per query with the bounded heap. `queries` must carry
    * (`queryIdCol`, `vecCol`); output is (queryIdCol, idCol, _approx).
    * `excludeSelf` drops id-equal pairs — only meaningful when queries
    * and items share an id space (vector-to-vector search). */
  private[graft] def adcTopR(queries: DataFrame, queryIdCol: String,
      r: Int, excludeSelf: Boolean): DataFrame = {
    require(queryIdCol != idCol,
      s"query id column must differ from the item id column ($idCol)")
    val q = queries.select(F.col(queryIdCol), F.col(vecCol).as("_qv"))
    val lut = q.crossJoin(F.broadcast(codewordFrame))
      .select(F.col(queryIdCol), F.col("_m"), F.col("_code"),
        Similarity.dot(
          F.slice(dvec(F.col("_qv")), F.col("_m") * dsub + 1, F.lit(dsub)),
          F.col("_cvec")).as("_lut"))
    val exploded = codes.select(F.col(idCol),
      F.posexplode(F.col("_codes")).as(Seq("_m", "_code")))
    val approx = exploded.join(lut, Seq("_m", "_code"))
      .filter(if (excludeSelf) F.col(queryIdCol) =!= F.col(idCol) else F.lit(true))
      .groupBy(queryIdCol, idCol)
      .agg(F.sum("_lut").as("_approx"))
    Ops.getTopKRecsBounded(approx, r, queryIdCol, idCol, "_approx")
  }

  /** Top-k cosine neighbors; `rerank·k` ADC candidates are re-scored
    * exactly. Output matches `IvfIndex.search`:
    * (query_id, neighbor_id, cosine, rank). */
  def search(queries: DataFrame, k: Int, rerank: Int = 4): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol))
    val cand = adcTopR(q, "query_id", rerank * k, excludeSelf = true)
    val scored = cand
      .join(raw.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("_cv")),
        F.col(idCol) === F.col("neighbor_id"))
      .join(q.select(F.col("query_id"), F.col(vecCol).as("_qv")), Seq("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        Similarity.cosine(F.col("_qv"), F.col("_cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
  }
}
