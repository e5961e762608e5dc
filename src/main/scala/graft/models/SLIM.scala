package graft.models

import org.apache.spark.sql.{DataFrame, functions => F}

/** SLIM: sparse linear item-item model via per-item ElasticNet
  * (reference: replay/models/slim.py:71-132).
  *
  * No distributed per-item ElasticNet exists in MLlib, so — like the
  * reference (slim.py:106-131 applyInPandas with a closure-captured CSC
  * matrix) — the DEFAULT path collects the interaction matrix into a
  * compact CSC (columns = items), broadcasts it once, and runs the
  * per-item coordinate-descent solves distributed over item partitions.
  * That collect is bounded by `maxCollectEntries` (the explicit contract
  * the reference exposes as `allow_collect_to_master`).
  *
  * Above the bound, the FULLY DISTRIBUTED path takes over (or, with
  * `distributedFallback = false`, fit fails fast). The key observation:
  * the CD solve for target item j only ever reads
  *   - corr(i)   = X_cᵢ · X_j        (target-candidate dots),
  *   - gram(i,k) = X_cᵢ · X_cₖ       (candidate-pair dots),
  *   - ‖X_cᵢ‖²                        (candidate column norms),
  * and ALL of these are co-occurrence sums computable relationally —
  * corr is already the preselect's dots table, gram is a bounded
  * (≤ maxNeighbours²/2 per target) candidate-pair join against that same
  * table, and the norms are one aggregation. So no executor ever holds the
  * matrix: per-target solver state is O(maxNeighbours²) regardless of
  * |users|·|items|. With integral ratings (the common binarized-log case)
  * the two paths produce bit-identical weights; with fractional ratings
  * they can differ at float-sum-order ulps.
  */
final class SLIM(
    val l1: Double = 0.01,
    val l2: Double = 0.01,
    val maxIter: Int = 50,
    val tol: Double = 1e-4,
    val maxNeighbours: Int = 50, // CD runs over the top-correlated items
    // hard bound on the interaction entries collected to the driver;
    // 5·10⁷ entries ≈ 0.8 GB of driver arrays
    val maxCollectEntries: Long = 50000000L,
    // above the bound: switch to the distributed-Gram solver (true) or
    // fail fast like the reference's allow_collect_to_master=False (false)
    val distributedFallback: Boolean = true,
    cols: RecCols = RecCols(),
) extends NeighbourRec(cols) {

  /** ElasticNet coordinate descent with a non-negativity constraint over
    * one target item's candidate neighbourhood. Pure local math — both fit
    * paths feed it the same (corr, gram, ‖·‖²) arrays. */
  private def solveCd(corr: Array[Double], gram: Array[Array[Double]],
      colNormSq: Array[Double]): Array[Double] = {
    val nc = corr.length
    val w = new Array[Double](nc)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta > tol) {
      delta = 0.0
      var i = 0
      while (i < nc) {
        if (colNormSq(i) > 0) {
          // partial residual correlation: corr_i - Σ_{k≠i} w_k * G(i,k)
          var rho = corr(i)
          var kk = 0
          while (kk < nc) {
            if (kk != i && w(kk) != 0.0) rho -= w(kk) * gram(i)(kk)
            kk += 1
          }
          val wNew = {
            val soft = math.signum(rho) * math.max(math.abs(rho) - l1, 0.0)
            val v = soft / (colNormSq(i) + l2)
            if (v < 0) 0.0 else v // SLIM constraint: non-negative weights
          }
          delta = math.max(delta, math.abs(wNew - w(i)))
          w(i) = wNew
        }
        i += 1
      }
      it += 1
    }
    w
  }

  protected def doFit(log: DataFrame): Unit = {
    val spark = log.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    // aggregate duplicate (query, item) rows up front (scipy csr_matrix
    // sums duplicate entries — slim.py inherits that semantic): both the
    // CSC solver arrays and the distributed candidate dots below read this
    // ONE matrix, so they stay mutually consistent on any input
    val mat = log.groupBy(cols.query, cols.item)
      .agg(F.sum(cols.rating).as(cols.rating)).cache()

    // candidate preselect, DISTRIBUTED (standard practical-SLIM feature
    // selection): co-occurrence dots via one self-join shuffle on the user
    // key (the ItemKNN plan), top-maxNeighbours per target item — no
    // per-item scan over the whole catalog, so the preselect stage is
    // O(co-occurring pairs), not O(|items|²).
    val lhs = mat.select(F.col(cols.query), F.col(cols.item).as("_i1"),
      F.col(cols.rating).as("_v1"))
    val rhs = mat.select(F.col(cols.query), F.col(cols.item).as("_i2"),
      F.col(cols.rating).as("_v2"))
    val dotsHalf = lhs.join(rhs, Seq(cols.query))
      .filter(F.col("_i1") < F.col("_i2"))
      .groupBy("_i1", "_i2").agg(F.sum(F.col("_v1") * F.col("_v2")).as("_d"))
    val dotsSym = dotsHalf.unionByName(dotsHalf.select(
      F.col("_i2").as("_i1"), F.col("_i1").as("_i2"), F.col("_d")))
    val candW = Window.partitionBy("_i1")
      .orderBy(F.col("_d").desc, F.col("_i2").asc)
    val candLists = dotsSym.filter(F.col("_d") > 0)
      .withColumn("_rn", F.row_number().over(candW))
      .filter(F.col("_rn") <= maxNeighbours)
      .groupBy("_i1").agg(
        F.collect_list(F.struct(F.col("_rn"), F.col("_i2"), F.col("_d"))).as("_c"))
      .withColumn("_sorted", F.array_sort(F.col("_c"))) // sort once, read twice
      .select(F.col("_i1"),
        F.transform(F.col("_sorted"), x => x.getField("_i2")).as("_cids"),
        F.transform(F.col("_sorted"), x => x.getField("_d")).as("_corrs"))

    val nnz = mat.count()
    val useDistributed = nnz > maxCollectEntries && distributedFallback
    if (!useDistributed && nnz > maxCollectEntries)
      throw new IllegalStateException(
        s"SLIM.fit would collect $nnz distinct (query, item) entries to the " +
        s"driver (bound: $maxCollectEntries) and distributedFallback is " +
        "disabled (the reference slim.py allow_collect_to_master contract). " +
        "Enable distributedFallback for the fully distributed Gram-join " +
        "solver, or raise maxCollectEntries if driver memory allows.")
    // the distributed path reads dotsHalf twice (candidate preselect, Gram
    // fetch) and candLists twice (membership fan-out, final solve join) —
    // unpersisted, each reuse would replay the co-occurrence self-join
    // shuffle, the single most expensive stage (measured 3.3× the CSC twin
    // at sf0.1 before this; the CSC path reads each exactly once)
    import org.apache.spark.storage.StorageLevel
    // r13 (guide §2.4): dotsHalf is persisted on BOTH paths — dotsSym
    // unions it with its transpose, so even the driver-CSC path was paying
    // the co-occurrence self-join twice inside the candLists job.
    dotsHalf.persist(StorageLevel.MEMORY_AND_DISK)
    if (useDistributed) candLists.persist(StorageLevel.MEMORY_AND_DISK)
    val sims =
      if (useDistributed) fitDistributed(mat, dotsHalf, candLists)
      else fitDriverCsc(mat, candLists)
    materialize(sims)
    dotsHalf.unpersist()
    if (useDistributed) candLists.unpersist()
    mat.unpersist() // state is materialized; don't hold the matrix cached
  }

  /** Reference-shaped path: driver CSC broadcast once, CD distributed over
    * items (slim.py:106-131). Deterministic dot order (user-sorted). */
  private def fitDriverCsc(mat: DataFrame, candLists: DataFrame): DataFrame = {
    val spark = mat.sparkSession
    import spark.implicits._

    // dense re-index users/items for array-backed math
    val users = mat.select(cols.query).distinct().orderBy(cols.query)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val items = mat.select(cols.item).distinct().orderBy(cols.item)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val nItems = items.size

    // CSC: per item, sorted (userIdx, rating) pairs
    val triples = mat.select(cols.query, cols.item, cols.rating).collect()
      .map(r => (items(r.getLong(1)), users(r.getLong(0)), r.getDouble(2)))
    val csc: Array[Array[(Int, Double)]] = {
      val buf = Array.fill(nItems)(scala.collection.mutable.ArrayBuffer.empty[(Int, Double)])
      triples.foreach { case (i, u, v) => buf(i) += ((u, v)) }
      buf.map(_.sortBy(_._1).toArray)
    }
    val bcCsc = spark.sparkContext.broadcast(csc)
    val bcIdx = spark.sparkContext.broadcast(items)

    candLists.as[(Long, Seq[Long], Seq[Double])]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (jId, cIds, corrSeq) =>
        val m = bcCsc.value
        val idx = bcIdx.value
        def dot(a: Array[(Int, Double)], b: Array[(Int, Double)]): Double = {
          var s = 0.0; var x = 0; var y = 0
          while (x < a.length && y < b.length) {
            if (a(x)._1 == b(y)._1) { s += a(x)._2 * b(y)._2; x += 1; y += 1 }
            else if (a(x)._1 < b(y)._1) x += 1 else y += 1
          }
          s
        }
        val cand = cIds.map(idx).toArray
        val nc = cand.length
        val colNormSq = cand.map(i => m(i).map(v => v._2 * v._2).sum)
        val gram = Array.ofDim[Double](nc, nc)
        var gi = 0
        while (gi < nc) {
          var gk = gi + 1
          while (gk < nc) {
            val d = dot(m(cand(gi)), m(cand(gk)))
            gram(gi)(gk) = d; gram(gk)(gi) = d
            gk += 1
          }
          gi += 1
        }
        val w = solveCd(corrSeq.toArray, gram, colNormSq)
        (0 until nc).filter(i => w(i) > 0).map(i => (cIds(i), jId, w(i)))
      }
      .toDF("item_one", "item_two", "similarity")
  }

  /** Scale path: every solver input arrives via joins. Gram entries for
    * target j are dots between j's candidates — a (j, cᵢ) ⋈ (j, cₖ)
    * candidate-pair expansion (≤ maxNeighbours²/2 rows per target, zero
    * dots omitted) joined against the co-occurrence table; column norms
    * are one aggregation over the matrix. Per-group collected state is
    * O(maxNeighbours²) structs — bounded no matter how large the log. */
  private def fitDistributed(mat: DataFrame, dotsHalf: DataFrame,
      candLists: DataFrame): DataFrame = {
    val spark = mat.sparkSession
    import spark.implicits._

    val normSq = mat.groupBy(F.col(cols.item).as("_ci"))
      .agg(F.sum(F.col(cols.rating) * F.col(cols.rating)).as("_nsq"))

    // (target j, candidate ci) membership pairs
    val cm = candLists.select(F.col("_i1").as("_j"),
      F.explode(F.col("_cids")).as("_ci"))

    // candidate norms per target: (j, ci, nsq)
    val cNorms = cm.join(normSq, Seq("_ci"))
      .groupBy("_j").agg(
        F.collect_list(F.struct(F.col("_ci"), F.col("_nsq"))).as("_norms"))

    // candidate-pair Gram entries per target: expand (j, ci < ck), fetch
    // the dot from dotsHalf (inner join — non-co-occurring pairs are 0 and
    // the solver's map lookup defaults them)
    val cmL = cm.select(F.col("_j"), F.col("_ci").as("_ga"))
    val cmR = cm.select(F.col("_j"), F.col("_ci").as("_gb"))
    val gramEntries = cmL.join(cmR, Seq("_j"))
      .filter(F.col("_ga") < F.col("_gb"))
      .join(dotsHalf.select(F.col("_i1").as("_ga"), F.col("_i2").as("_gb"),
        F.col("_d")), Seq("_ga", "_gb"))
      .groupBy("_j").agg(
        F.collect_list(F.struct(F.col("_ga"), F.col("_gb"), F.col("_d"))).as("_gram"))

    candLists.join(cNorms, F.col("_i1") === F.col("_j")).drop("_j")
      .join(gramEntries, F.col("_i1") === F.col("_j"), "left").drop("_j")
      .select(F.col("_i1"), F.col("_cids"), F.col("_corrs"),
        F.col("_norms"), F.coalesce(F.col("_gram"), F.array()).as("_gram"))
      .as[(Long, Seq[Long], Seq[Double], Seq[(Long, Double)], Seq[(Long, Long, Double)])]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (jId, cIds, corrSeq, normSeq, gramSeq) =>
        val nc = cIds.length
        val pos = cIds.zipWithIndex.toMap
        val colNormSq = new Array[Double](nc)
        normSeq.foreach { case (ci, nsq) => colNormSq(pos(ci)) = nsq }
        val gram = Array.ofDim[Double](nc, nc)
        gramSeq.foreach { case (ga, gb, d) =>
          val a = pos(ga); val b = pos(gb)
          gram(a)(b) = d; gram(b)(a) = d
        }
        val w = solveCd(corrSeq.toArray, gram, colNormSq)
        (0 until nc).filter(i => w(i) > 0).map(i => (cIds(i), jId, w(i)))
      }
      .toDF("item_one", "item_two", "similarity")
  }

  /** Reference slim.py:29-32: beta (L2) ~ loguniform [1e-6, 5],
    * lambda_ (L1) ~ loguniform [1e-6, 2] — ln-space borders. */
  override def searchBorders: Map[String, (Double, Double)] = Map(
    "beta" -> (math.log(1e-6), math.log(5.0)),
    "lambda_" -> (math.log(1e-6), math.log(2.0)))

  override def withParams(p: Map[String, Double]): SLIM = new SLIM(
    l1 = p.get("lambda_").map(math.exp).getOrElse(l1),
    l2 = p.get("beta").map(math.exp).getOrElse(l2),
    maxIter, tol, maxNeighbours, maxCollectEntries, distributedFallback, cols)
}
