package graft.text

import graft.SparkSpec
import graft.models.HnswIndexTestAccess

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int = 400, dims: Int = 16): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { id =>
      val c = (id % 10).toInt
      val v = (0 until dims).map { d =>
        val base = if (d % 10 == c) 4.0 else 0.0
        base + (HnswIndexTestAccess.uniform(7L, id * 37 + d) - 0.5)
      }
      (id, v)
    }

  private def bruteTopK(rows: Seq[(Long, Seq[Double])],
      queries: Seq[(Long, Seq[Double])], k: Int): Map[Long, Seq[Long]] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    queries.map { case (q, qv) =>
      q -> rows.filter(_._1 != q)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(k).map(_._1)
    }.toMap
  }

  test("IVF-PQ recall >= 0.95 vs brute-force cosine on a clustered corpus") {
    val rows = corpus()
    val vectors = rows.toDF("vec_id", "embedding")
    val idx = new IvfPqIndex(nCentroids = 10, nProbe = 3,
      numSubspaces = 4, codebookSize = 16).fit(vectors)
    val queries = rows.filter(_._1 % 7 == 0)
    val got = idx.search(queries.toDF("vec_id", "embedding"), k = 10, rerank = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = bruteTopK(rows, queries, k = 10)
    val hits = exact.map { case (q, want) => want.count(got(q).contains) }.sum
    val recall = hits.toDouble / (exact.size * 10)
    assert(recall >= 0.95, s"IVF-PQ recall vs brute force = $recall")
  }

  test("full probes + covering re-rank pool reproduce brute force exactly") {
    // when every cell is probed and the crop covers the catalog, the exact
    // re-rank restores brute-force top-k bit-for-bit (the approximation
    // only ever CROPS — it never re-scores what survives)
    val rows = corpus(120)
    val vectors = rows.toDF("vec_id", "embedding")
    val queries = rows.take(8).toDF("vec_id", "embedding")
    val idx = new IvfPqIndex(nCentroids = 6, nProbe = 6,
      numSubspaces = 4, codebookSize = 8).fit(vectors)
    val got = idx.search(queries, k = 5, rerank = 120).collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(queries, vectors, 5)
      .collect().map(_.toSeq).toSet
    assert(got == brute)
  }

  test("search is deterministic across fits and input partition layouts") {
    val rows = corpus(150)
    val queries = rows.take(10)
    def run(parts: Int): Set[Seq[Any]] =
      new IvfPqIndex(nCentroids = 5, nProbe = 2, numSubspaces = 4,
        codebookSize = 8)
        .fit(rows.toDF("vec_id", "embedding").repartition(parts))
        .search(queries.toDF("vec_id", "embedding").repartition(3), k = 5,
          rerank = 6)
        .collect().map(_.toSeq).toSet
    assert(run(1) == run(7))
  }

  test("Word2Vec predicts through IvfPqAnn; ModelIO round-trips the config") {
    import graft.models.{IvfPqAnn, ModelIO, Word2VecRec}
    val i = graft.Tables.interactions(spark, "/root/testdata/sf0.001")
    val exact = new Word2VecRec(vectorSize = 8, ann = None)
      .fitPredict(i, 5).cache()
    // full probe on the small catalog (the ADC compression is what's
    // under test; MIPS-aware probe sizing is the caller's contract, as
    // with IvfAnn); candidate pool covers k + seen history
    val model = new Word2VecRec(vectorSize = 8,
      ann = Some(new IvfPqAnn(nCentroids = 4, nProbe = 4,
        numSubspaces = 4, codebookSize = 16, candidatesPerQuery = 128)))
    val approx = model.fitPredict(i, 5).cache()
    val hits = approx.join(exact, Seq("query_id", "item_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.9, s"IVF-PQ recall vs exact predict = $recall")

    val dir = java.nio.file.Files.createTempDirectory("w2v_ivfpq").toString
    ModelIO.saveWord2Vec(model, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val ip = loaded.ann.get.asInstanceOf[IvfPqAnn]
    assert(ip.nCentroids == 4 && ip.nProbe == 4 && ip.numSubspaces == 4 &&
      ip.codebookSize == 16 && ip.candidatesPerQuery == 128)
    val before = approx.collect().map(_.toSeq).toSet
    val after = loaded.predict(i, 5).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("ADC scan touches only probed cells' codes") {
    // structural: an item whose cell is never probed cannot appear, even
    // if it is the true nearest neighbor — the inverted-file contract
    val tight = (0L until 40L).map(i => (i, Seq(10.0, 0.0, 0.0, 0.0)))
    val far = (100L until 140L).map(i => (i, Seq(0.0, 10.0, 0.0, 0.0)))
    val rows = tight ++ far
    val idx = new IvfPqIndex(nCentroids = 2, nProbe = 1,
      numSubspaces = 2, codebookSize = 4).fit(rows.toDF("vec_id", "embedding"))
    val q = Seq((999L, Seq(10.0, 0.1, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = idx.search(q, k = 5, rerank = 20)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ < 100),
      s"nProbe=1 must stay inside the probed cell, got $got")
  }
}
