package graft.models

import graft.SparkSpec

class ShardedHnswSpec extends SparkSpec {
  import spark.implicits._

  // same clustered-corpus generator as HnswSpec: 10 separated centers,
  // seeded pseudo-random offsets
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

  test("sharded search recall >= 0.95 vs brute-force cosine") {
    val rows = corpus()
    val vectors = rows.toDF("vec_id", "embedding")
    val queries = rows.filter(_._1 % 7 == 0)
    val got = ShardedHnsw.searchNeighbors(vectors,
        queries.toDF("vec_id", "embedding"), k = 10,
        nShards = 4, m = 12, efConstruction = 100, efSearch = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = bruteTopK(rows, queries, k = 10)
    val hits = exact.map { case (q, want) => want.count(got(q).contains) }.sum
    val recall = hits.toDouble / (exact.size * 10)
    assert(recall >= 0.95, s"sharded HNSW recall vs brute force = $recall")
  }

  test("results are independent of input partition layout and shard count of 1 equals the driver-built graph") {
    val rows = corpus(200)
    val q = rows.filter(_._1 % 11 == 0)
    def run(parts: Int, shards: Int): Set[Seq[Any]] =
      ShardedHnsw.searchNeighbors(
        rows.toDF("vec_id", "embedding").repartition(parts),
        q.toDF("vec_id", "embedding").repartition(3), k = 5,
        nShards = shards, m = 8, efConstruction = 50, efSearch = 32)
        .collect().map(_.toSeq).toSet
    assert(run(1, 3) == run(7, 3), "shard layout must not depend on input partitioning")
    // nShards=1 builds ONE graph over the whole corpus with the same
    // sorted-id determinism contract as the driver-built HnswAnn — the
    // two paths must return byte-identical rows
    val driver = HnswAnn.searchNeighbors(
      rows.toDF("vec_id", "embedding"),
      q.toDF("vec_id", "embedding"), k = 5,
      m = 8, efConstruction = 50, efSearch = 32)
      .collect().map(_.toSeq).toSet
    assert(run(4, 1) == driver, "single-shard must equal the driver-built graph")
  }

  test("every shard contributes: nearest neighbor in a foreign shard is found") {
    // two identical-direction vectors that hash into different shards:
    // 1000 and 1003 differ mod 4 under xxhash64 for at least one pair —
    // instead of relying on hash luck, plant ONE near-copy for each of
    // several anchors and check all are found regardless of shard layout
    val base = corpus(100)
    val planted = (0 until 8).map { i =>
      val (aid, av) = base(i * 11)
      (5000L + i, av.map(_ * 1.001)) // near-copy of anchor, cos ≈ 1
    }
    val all = base ++ planted
    val queries = (0 until 8).map(i => base(i * 11))
    val got = ShardedHnsw.searchNeighbors(all.toDF("vec_id", "embedding"),
        queries.toDF("vec_id", "embedding"), k = 1,
        nShards = 5, m = 8, efConstruction = 50, efSearch = 32)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 8).foreach { i =>
      val (aid, _) = base(i * 11)
      assert(got(aid) == 5000L + i,
        s"anchor $aid: nearest must be its planted copy ${5000 + i}, got ${got(aid)}")
    }
  }

  test("ShardedHnswAnn candidates: layout-independent and within the efSearch contract") {
    val rows = corpus(200)
    val queries = rows.take(20).map { case (i, v) => (i + 9000, v) }
    def run(parts: Int): Array[Seq[Any]] =
      new ShardedHnswAnn(nShards = 3, m = 8, efConstruction = 50, efSearch = 16)
        .fit(rows.toDF("item_id", "vec").repartition(parts), "item_id", "vec")
        .candidates(queries.toDF("query_id", "vec").repartition(3), "query_id", "vec")
        .collect().map(_.toSeq)
    val a = run(1)
    val b = run(6)
    assert(a.toSet == b.toSet)
    val perQuery = a.groupBy(_.head)
    assert(perQuery.size == 20)
    perQuery.values.foreach(c => assert(c.length <= 16,
      s"candidates per query must honor efSearch, got ${c.length}"))
    // the top candidate must be the exact best dot-product item
    val best = a.groupBy(_.head.asInstanceOf[Long]).view.mapValues { c =>
      val top = c.maxBy(_(2).asInstanceOf[Double])
      top(1).asInstanceOf[Long]
    }.toMap
    queries.foreach { case (qid, qv) =>
      val exact = rows.maxBy { case (_, v) =>
        v.zip(qv).map { case (x, y) => x * y }.sum }._1
      assert(best(qid) == exact, s"query $qid: best dot candidate")
    }
  }

  test("Word2Vec predicts through ShardedHnswAnn; ModelIO round-trips the config") {
    val i = graft.Tables.interactions(spark, "/root/testdata/sf0.001")
    val exact = new Word2VecRec(vectorSize = 8, ann = None)
      .fitPredict(i, 5).cache()
    // efSearch covers k + seen history, same contract as the driver-built
    // HnswAnn twin (HnswSpec); sf0.001 histories run ~40 items
    val model = new Word2VecRec(vectorSize = 8,
      ann = Some(new ShardedHnswAnn(nShards = 3, m = 8,
        efConstruction = 100, efSearch = 128)))
    val approx = model.fitPredict(i, 5).cache()
    val hits = approx.join(exact, Seq("query_id", "item_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.95, s"sharded HNSW recall vs exact predict = $recall")

    val dir = java.nio.file.Files.createTempDirectory("w2v_shnsw").toString
    ModelIO.saveWord2Vec(model, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val h = loaded.ann.get.asInstanceOf[ShardedHnswAnn]
    assert(h.nShards == 3 && h.m == 8 && h.efConstruction == 100 && h.efSearch == 128)
    // deterministic rebuild: loaded predictions == pre-save predictions
    val before = approx.collect().map(_.toSeq).toSet
    val after = loaded.predict(i, 5).collect().map(_.toSeq).toSet
    assert(after == before)
  }
}
