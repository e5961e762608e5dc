package graft.models

import org.apache.spark.sql.{DataFrame, Row, functions => F}

/** SLIM: sparse linear item-item model via per-item ElasticNet
  * (reference: replay/models/slim.py:71-132).
  *
  * No distributed per-item ElasticNet exists in MLlib, so — like the
  * reference (slim.py:106-131 applyInPandas with a closure-captured CSC
  * matrix) — the interaction matrix is collected into a compact CSC
  * (columns = items), broadcast once, and the per-item coordinate-descent
  * solves run DISTRIBUTED over item partitions via flatMapGroups. The
  * collect bounds this model to matrices that fit one executor
  * (reference `allow_collect_to_master` caveat, SURVEY §7.4.4); everything
  * else — fit dispatch, prediction joins — stays relational.
  */
final class SLIM(
    val l1: Double = 0.01,
    val l2: Double = 0.01,
    val maxIter: Int = 50,
    val tol: Double = 1e-4,
    val maxNeighbours: Int = 50, // CD runs over the top-correlated items
    // hard bound on the interaction entries collected to the driver — the
    // explicit contract the reference exposes as `allow_collect_to_master`
    // (slim.py inherits the driver-CSC design); 5·10⁷ entries ≈ 0.8 GB of
    // driver arrays. Exceeding it fails FAST with a clear message instead
    // of OOMing mid-collect.
    val maxCollectEntries: Long = 50000000L,
    cols: RecCols = RecCols(),
) extends NeighbourRec(cols) {

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

    val nnz = mat.count()
    if (nnz > maxCollectEntries)
      throw new IllegalStateException(
        s"SLIM.fit would collect $nnz distinct (query, item) entries to the " +
        s"driver (bound: $maxCollectEntries). The per-item ElasticNet solver " +
        "is driver-CSC-backed by design (reference slim.py " +
        "allow_collect_to_master contract); for larger matrices raise " +
        "maxCollectEntries only if driver memory allows, or use ItemKNN / " +
        "ALSRec, whose fits are fully distributed.")

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
    val (l1c, l2c, iters, tolc, maxNbr) = (l1, l2, maxIter, tol, maxNeighbours)

    // candidate preselect, DISTRIBUTED (standard practical-SLIM feature
    // selection): co-occurrence dots via one self-join shuffle on the user
    // key (the ItemKNN plan), top-maxNeighbours per target item — no
    // per-item scan over the whole catalog, so the preselect stage is
    // O(co-occurring pairs), not O(|items|²). Ratings are integral in
    // practice, so the distributed sums equal the driver-side dots exactly.
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
      .filter(F.col("_rn") <= maxNbr)
      .groupBy("_i1").agg(
        F.collect_list(F.struct(F.col("_rn"), F.col("_i2"), F.col("_d"))).as("_c"))
      .withColumn("_sorted", F.array_sort(F.col("_c"))) // sort once, read twice
      .select(F.col("_i1"),
        F.transform(F.col("_sorted"), x => x.getField("_i2")).as("_cids"),
        F.transform(F.col("_sorted"), x => x.getField("_d")).as("_corrs"))
      .as[(Long, Seq[Long], Seq[Double])]

    // one coordinate-descent solve per target item, distributed over items
    val sims = candLists.repartition(spark.sparkContext.defaultParallelism)
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
        val corr = corrSeq.toArray
        val w = new Array[Double](nc)
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
        var it = 0
        var delta = Double.MaxValue
        while (it < iters && delta > tolc) {
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
                val soft = math.signum(rho) * math.max(math.abs(rho) - l1c, 0.0)
                val v = soft / (colNormSq(i) + l2c)
                if (v < 0) 0.0 else v // SLIM constraint: non-negative weights
              }
              delta = math.max(delta, math.abs(wNew - w(i)))
              w(i) = wNew
            }
            i += 1
          }
          it += 1
        }
        (0 until nc).filter(i => w(i) > 0).map(i => (cIds(i), jId, w(i)))
      }
      .toDF("item_one", "item_two", "similarity")
    materialize(sims)
    mat.unpersist() // state is materialized; don't hold the matrix cached
  }
}
