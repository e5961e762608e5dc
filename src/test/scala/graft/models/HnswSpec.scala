package graft.models

import graft.SparkSpec

class HnswSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: 10 well-separated cluster centers in
  // 16 dims, 40 points each, pseudo-random but seeded offsets
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

  test("HnswIndex search recall >= 0.95 vs brute-force cosine") {
    val rows = corpus()
    val idx = HnswIndexTestAccess.build(rows, m = 12, efC = 100, metric = "cosine")
    val queries = rows.filter(_._1 % 7 == 0)
    val exact = bruteTopK(rows, queries, k = 10)
    var hits = 0
    var total = 0
    queries.foreach { case (q, qv) =>
      val got = idx.search(qv.toArray, 11, 64).map(_._1).filter(_ != q).take(10)
      hits += got.count(exact(q).contains)
      total += 10
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.95, s"HNSW recall vs brute force = $recall")
  }

  test("HnswAnn candidates are independent of the input partition layout") {
    val rows = corpus(200)
    val df1 = rows.toDF("item_id", "vec").repartition(1)
    val df7 = rows.toDF("item_id", "vec").repartition(7)
    val queries = rows.take(20).toDF("query_id", "vec")
    val a = new HnswAnn(m = 8, efConstruction = 50, efSearch = 16)
      .fit(df1, "item_id", "vec")
      .candidates(queries.repartition(3), "query_id", "vec")
      .collect().map(_.toSeq).toSet
    val b = new HnswAnn(m = 8, efConstruction = 50, efSearch = 16)
      .fit(df7, "item_id", "vec")
      .candidates(queries.repartition(5), "query_id", "vec")
      .collect().map(_.toSeq).toSet
    assert(a == b, "graph build/search must not depend on partition layout")
    assert(a.nonEmpty)
  }

  test("searchNeighbors excludes self, ranks by cosine desc, caps at k") {
    val rows = corpus(150)
    val vecs = rows.toDF("vec_id", "embedding")
    val out = HnswAnn.searchNeighbors(vecs, vecs.filter($"vec_id" < 10), k = 5)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 5))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b - 1e-12
        case _ => true
      }, "cosine must be non-increasing in rank")
    }
  }

  test("Word2Vec predicts through HnswAnn with >= 0.95 recall; ModelIO round-trips the config") {
    val i = graft.Tables.interactions(spark, "/root/testdata/sf0.001")
    val exact = new Word2VecRec(vectorSize = 8, ann = None)
      .fitPredict(i, 5).cache()
    // efSearch must cover k + the user's seen history (the predict path
    // anti-joins seen items AFTER candidate generation — same contract as
    // IvfAnn probe coverage); sf0.001 histories run ~40 items
    val model = new Word2VecRec(vectorSize = 8,
      ann = Some(new HnswAnn(m = 8, efConstruction = 100, efSearch = 128)))
    val approx = model.fitPredict(i, 5).cache()
    val hits = approx.join(exact, Seq("query_id", "item_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.95, s"HNSW recall vs brute force = $recall")

    val dir = java.nio.file.Files.createTempDirectory("w2v_hnsw").toString
    ModelIO.saveWord2Vec(model, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val h = loaded.ann.get.asInstanceOf[HnswAnn]
    assert(h.m == 8 && h.efConstruction == 100 && h.efSearch == 128)
    // deterministic rebuild: loaded predictions == pre-save predictions
    val before = approx.collect().map(_.toSeq).toSet
    val after = loaded.predict(i, 5).collect().map(_.toSeq).toSet
    assert(after == before)
  }
}

/** Test-only access to the private index constructor/uniform. */
object HnswIndexTestAccess {
  def uniform(seed: Long, id: Long): Double = HnswIndex.uniform(seed, id)
  def build(rows: Seq[(Long, Seq[Double])], m: Int, efC: Int,
      metric: String): HnswIndex =
    HnswIndex.fromRows(rows.map { case (i, v) => (i, v.toArray) }.toArray,
      m, efC, metric, seed = 42L)
}
