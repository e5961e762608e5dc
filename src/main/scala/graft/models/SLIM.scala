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
    cols: RecCols = RecCols(),
) extends NeighbourRec(cols) {

  protected def doFit(log: DataFrame): Unit = {
    val spark = log.sparkSession
    import spark.implicits._

    // dense re-index users/items for array-backed math
    val users = log.select(cols.query).distinct().orderBy(cols.query)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val items = log.select(cols.item).distinct().orderBy(cols.item)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val itemIds = items.toSeq.sortBy(_._2).map(_._1).toArray
    val nItems = items.size

    // CSC: per item, sorted (userIdx, rating) pairs
    val triples = log.select(cols.query, cols.item, cols.rating).collect()
      .map(r => (items(r.getLong(1)), users(r.getLong(0)), r.getDouble(2)))
    val csc: Array[Array[(Int, Double)]] = {
      val buf = Array.fill(nItems)(scala.collection.mutable.ArrayBuffer.empty[(Int, Double)])
      triples.foreach { case (i, u, v) => buf(i) += ((u, v)) }
      buf.map(_.sortBy(_._1).toArray)
    }
    val bcCsc = spark.sparkContext.broadcast(csc)
    val bcIds = spark.sparkContext.broadcast(itemIds)
    val (l1c, l2c, iters, tolc, maxNbr) = (l1, l2, maxIter, tol, maxNeighbours)

    // one coordinate-descent solve per target item, distributed over items
    val sims = spark.createDataset(0 until nItems).repartition(
        spark.sparkContext.defaultParallelism)
      .flatMap { j =>
        val m = bcCsc.value
        val ids = bcIds.value
        val n = m.length
        def dot(a: Array[(Int, Double)], b: Array[(Int, Double)]): Double = {
          var s = 0.0; var x = 0; var y = 0
          while (x < a.length && y < b.length) {
            if (a(x)._1 == b(y)._1) { s += a(x)._2 * b(y)._2; x += 1; y += 1 }
            else if (a(x)._1 < b(y)._1) x += 1 else y += 1
          }
          s
        }
        val target = m(j)
        // candidate preselect: only items correlated with the target take
        // part in the solve (standard practical-SLIM feature selection —
        // caps the CD cost per item at maxNeighbours², independent of the
        // catalog size)
        val corrAll = Array.tabulate(n)(i => if (i == j) 0.0 else dot(m(i), target))
        val cand = (0 until n)
          .filter(i => i != j && corrAll(i) > 0)
          .sortBy(i => (-corrAll(i), i))
          .take(maxNbr)
          .toArray
        val nc = cand.length
        val colNormSq = cand.map(i => m(i).map(v => v._2 * v._2).sum)
        val corr = cand.map(corrAll)
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
        (0 until nc).filter(i => w(i) > 0).map(i => (ids(cand(i)), ids(j), w(i)))
      }
      .toDF("item_one", "item_two", "similarity")
    materialize(sims)
  }
}
