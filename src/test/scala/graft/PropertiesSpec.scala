package graft

import org.apache.spark.sql.{functions => F}
import graft.core.Ops
import graft.preprocessing.LabelEncoder
import graft.splitters.RatioSplitter

/** Property-style invariants (SURVEY §5 engine test plan) over seeded
  * random inputs: top-k determinism under repartitioning, split partition
  * laws, encoder bijectivity, sampler containment. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  def randomLog(seed: Int, n: Int): List[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    List.fill(n)((rnd.nextInt(6).toLong, rnd.nextInt(9).toLong,
      (rnd.nextInt(5) + 1).toDouble))
  }

  test("topK: at most k rows per query, stable under repartitioning") {
    for (seed <- 1 to 5) {
      val k = seed % 4 + 1
      val df = randomLog(seed, 40).toDF("query_id", "item_id", "rating")
        .groupBy("query_id", "item_id").agg(F.max("rating").as("rating"))
      val a = Ops.getTopKRecs(df, k).collect().map(_.toSeq).toSet
      val b = Ops.getTopKRecs(df.repartition(7), k).collect().map(_.toSeq).toSet
      assert(a == b, s"seed=$seed: top-k differs across partitionings")
      val counts = Ops.getTopKRecs(df, k).groupBy("query_id").count()
        .select("count").as[Long].collect()
      assert(counts.forall(_ <= k))
    }
  }

  test("RatioSplitter: mark partitions the input exactly") {
    for (seed <- 1 to 4) {
      val df = randomLog(seed, 30).zipWithIndex
        .map { case ((q, i, r), idx) => (q, i, r, idx.toLong) }
        .toDF("query_id", "item_id", "rating", "timestamp")
      val (train, test) = RatioSplitter(0.3, tsCol = "timestamp",
        tieCol = Some("item_id")).split(df)
      assert(train.count() + test.count() == df.count(), s"seed=$seed")
      assert(train.intersect(test).count() == 0, s"seed=$seed")
    }
  }

  test("LabelEncoder: transform then inverse is identity; codes dense") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(25)(rnd.nextLong() % 1000)
      val df = xs.toDF("x")
      val enc = LabelEncoder.fit(df, "x")
      val round = enc.inverseTransform(enc.transform(df)).as[Long].collect().sorted
      assert(round.toSeq == xs.sorted, s"seed=$seed")
      val codes = enc.mapping.select("code").as[Long].collect().sorted
      assert(codes.toSeq == codes.indices.map(_.toLong), s"seed=$seed")
    }
  }

  test("sampleTopK: output is a <=k-per-query subset of its input") {
    for (seed <- 1 to 4) {
      val k = seed % 3 + 1
      val df = randomLog(seed, 40).toDF("query_id", "item_id", "rating")
        .groupBy("query_id", "item_id").agg(F.max("rating").as("rating"))
      val out = Ops.sampleTopK(df, k, seed = seed)
      val inSet = df.select("query_id", "item_id").as[(Long, Long)].collect().toSet
      val outRows = out.select("query_id", "item_id").as[(Long, Long)].collect()
      assert(outRows.toSet.subsetOf(inSet), s"seed=$seed")
      assert(outRows.groupBy(_._1).forall(_._2.length <= k), s"seed=$seed")
    }
  }

  test("SequenceTokenizer.pad: fixed width, correct length, ordered suffix") {
    import graft.preprocessing.SequenceTokenizer
    for (seed <- 1 to 4) {
      val maxLen = seed % 4 + 2
      val rnd = new scala.util.Random(seed)
      val rows = List.fill(60)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(1000).toLong))
      val df = rows.toDF("query_id", "item_id", "_s")
        .withColumn("timestamp", F.timestamp_seconds(F.col("_s"))).drop("_s")
      val out = SequenceTokenizer.pad(df, maxLen, padValue = -1L)
        .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2))))
        .toMap
      val hist = rows.groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(r => (r._3, r._2)).sorted.map(_._2) // (ts, item) asc
      }
      for ((q, items) <- hist) {
        val (arr, len) = out(q)
        assert(arr.length == maxLen, s"seed=$seed q=$q: not fixed-width")
        assert(len == math.min(items.length, maxLen).toLong, s"seed=$seed q=$q len")
        assert(arr.takeRight(len.toInt) == items.takeRight(len.toInt),
          s"seed=$seed q=$q: suffix should be the most recent events in order")
        assert(arr.dropRight(len.toInt).forall(_ == -1L), s"seed=$seed q=$q pad")
      }
    }
  }

  test("filterSeen never returns a history pair; minhash est sim in [0,1]") {
    for (seed <- 1 to 3) {
      val log = randomLog(seed, 30).toDF("query_id", "item_id", "rating")
        .groupBy("query_id", "item_id").agg(F.max("rating").as("rating"))
      val history = log.sample(withReplacement = false, 0.5, seed)
      val out = Ops.filterSeen(log, history, k = 3)
      val hist = history.select("query_id", "item_id").as[(Long, Long)].collect().toSet
      val got = out.select("query_id", "item_id").as[(Long, Long)].collect().toSet
      assert(got.intersect(hist).isEmpty, s"seed=$seed")
    }
  }

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("data", "spark", "row", "join", "agg", "scan", "x9", "!?", "a")
    (0L until n.toLong).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
  }

  test("BPE encode conserves characters: merges regroup, never rewrite") {
    import graft.text.Bpe
    for (seed <- 1 to 3) {
      val docs = randomDocs(seed, 25).toDF("doc_id", "text")
      val merges = Bpe.train(docs, numMerges = 8, addEow = false)
      val enc = Bpe.encode(docs, merges, addEow = false)
        .select("doc_id", "bpe_tokens").as[(Long, Seq[String])]
        .collect().toMap
      val pre = docs.select(F.col("doc_id"),
          graft.text.TextStats.preTokens(F.col("text")).as("p"))
        .as[(Long, Seq[String])].collect().toMap
      pre.foreach { case (id, toks) =>
        val expected = toks.map(_.trim).filter(_.nonEmpty).mkString
        val got = enc.getOrElse(id, Seq.empty).mkString
        assert(got == expected, s"seed=$seed doc=$id: '$got' != '$expected'")
      }
    }
  }

  test("histogram conserves total mass for any input, including out-of-range") {
    import graft.core.Sketch
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val vals = Seq.fill(200)(rnd.nextDouble() * 300 - 50) // spills both edges
      val hist = Sketch.histogramBins(vals.toDF("v"), "v", 0.0, 200.0, 32)
        .as[(Long, Long)].collect()
      assert(hist.map(_._2).sum == 200L, s"seed=$seed")
      assert(hist.forall { case (b, c) => b >= 0 && b < 32 && c > 0 })
    }
  }

  test("DSIR: per-doc hashed counts sum to the doc's gram count; weights finite") {
    import graft.text.Dsir
    for (seed <- 1 to 2) {
      val docs = randomDocs(seed, 20).toDF("doc_id", "text")
      val counts = Dsir.hashedCounts(docs, buckets = 64)
        .groupBy("doc_id").agg(F.sum("cnt").as("n"))
        .as[(Long, Long)].collect().toMap
      val expected = randomDocs(seed, 20).map { case (id, text) =>
        val wc = text.trim.toLowerCase.split("\\s+").count(_.nonEmpty)
        (id, (wc + math.max(0, wc - 1)).toLong) // unigrams + bigrams
      }.toMap
      expected.foreach { case (id, g) =>
        assert(counts.getOrElse(id, 0L) == g, s"seed=$seed doc=$id")
      }
      val target = randomDocs(seed + 10, 10).toDF("doc_id", "text")
      val w = Dsir.logWeights(docs, target, buckets = 64)
        .as[(Long, Double)].collect()
      assert(w.forall { case (_, v) => !v.isNaN && !v.isInfinite },
        s"seed=$seed")
    }
  }

  test("snapshotDiff partitions ids; set counts match exact set algebra") {
    import graft.text.Dedup
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val prev = randomDocs(seed, 30).toDF("doc_id", "text")
      // next: random subset kept, some texts perturbed, some new ids
      val next = randomDocs(seed, 30).filter(_ => rnd.nextBoolean())
        .map { case (i, t) =>
          (i, if (rnd.nextInt(3) == 0) t + " changed!" else t) } ++
        (100L until (100L + rnd.nextInt(5))).map(i => (i, s"new $i"))
      val nextDf = next.toDF("doc_id", "text")
      val got = Dedup.snapshotDiff(prev, nextDf)
        .as[(Long, String)].collect().toMap
      val prevIds = (0L until 30L).toSet
      val nextIds = next.map(_._1).toSet
      // every id appears exactly once with a status
      assert(got.keySet == prevIds ++ nextIds, s"seed=$seed")
      assert(got.count(_._2 == "added") == (nextIds -- prevIds).size)
      assert(got.count(_._2 == "removed") == (prevIds -- nextIds).size)
      // changed+unchanged covers exactly the intersection
      assert(got.count(kv => kv._2 == "changed" || kv._2 == "unchanged") ==
        (prevIds & nextIds).size, s"seed=$seed")
    }
  }
}
