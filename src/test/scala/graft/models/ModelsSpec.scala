package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  // mirror of the reference's tiny fixture style (tests/models/test_pop_rec.py)
  def log = Seq(
    (0L, 0L, 1.0), (0L, 1L, 1.0),
    (1L, 1L, 1.0), (1L, 2L, 1.0),
    (2L, 1L, 1.0), (2L, 2L, 1.0),
  ).toDF("query_id", "item_id", "rating")

  test("PopRec popularity = user share; top-1 unseen per user is correct") {
    val m = new PopRec().fit(log)
    val pop = m.itemPopularity.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pop == Map(0L -> 1.0 / 3, 1L -> 1.0, 2L -> 2.0 / 3))
    val recs = m.predict(log, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 0 hasn't seen 2 (pop 2/3) → 2; user 1 and 2 haven't seen 0 → 0
    assert(recs == Map(0L -> 2L, 1L -> 0L, 2L -> 0L))
  }

  test("predictProba is a one-hot action distribution per (query, position)") {
    val p = new PopRec().fit(log).predictProba(log, k = 2)
    // every (query, position) cell carries total mass exactly 1.0 (≤ 1 per
    // the OBP contract; deterministic rankers are one-hot)
    val sums = p.groupBy("query_id", "position").agg(F.sum("prob").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(_ == 1.0))
    // positions are 0-based and bounded by k
    assert(p.agg(F.max("position")).first().getLong(0) < 2L)
    assert(p.agg(F.min("position")).first().getLong(0) == 0L)
  }

  test("sampled predict draws k unseen items; deterministic under the seed") {
    val m = new PopRec().fit(log)
    m.sample = true
    val recs = m.predict(log, k = 1)
    // one rec per user, never a seen pair
    assert(recs.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ == 1L))
    assert(recs.join(log.select("query_id", "item_id"),
      Seq("query_id", "item_id"), "left_semi").count() == 0)
    // reruns agree bit-for-bit (portable hash, not an RNG stream)
    assert(recs.collect().map(_.toSeq).toSet ==
      m.predict(log, k = 1).collect().map(_.toSeq).toSet)
    // a different seed may select differently, but stays valid
    m.sampleSeed = 7L
    val recs2 = m.predict(log, k = 1)
    assert(recs2.count() == 3)
    // flag off → the deterministic path, unchanged
    m.sample = false
    m.sampleSeed = 42L
    val det = m.predict(log, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(det == Map(0L -> 2L, 1L -> 0L, 2L -> 0L))
  }

  test("sampled predictProba tiles normalized popularity; mass sums to 1") {
    val m = new PopRec().fit(log)
    m.sample = true
    val p = m.predictProba(log, k = 2)
    val sums = p.groupBy("query_id", "position").agg(F.sum("prob").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-12))
    // probability proportional to popularity: item 1 (pop 1.0) carries
    // 1.0/(1/3 + 1 + 2/3) = 0.5 at every position
    val p1 = p.filter($"item_id" === 1L).select("prob").as[Double].collect()
    assert(p1.forall(v => math.abs(v - 0.5) < 1e-12))
  }

  test("predictProbaPairs == predictProba position 0 at the queried pairs") {
    val m = new PopRec().fit(log)
    m.sample = true
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("query_id", "item_id")
    val viaPairs = m.predictProbaPairs(pairs)
      .select("query_id", "item_id", "position", "prob")
      .collect().map(_.toSeq).toSet
    val viaDense = m.predictProba(log, k = 2).filter($"position" === 0L)
      .join(pairs, Seq("query_id", "item_id"), "left_semi")
      .select("query_id", "item_id", "position", "prob")
      .collect().map(_.toSeq).toSet
    assert(viaPairs == viaDense && viaPairs.size == 3)
    // deterministic rankers must refuse: their distribution is one-hot
    m.sample = false
    intercept[IllegalArgumentException] { m.predictProbaPairs(pairs) }
  }

  test("items-restricted predict stays within the candidate set, pre-crop") {
    val allowed = Seq(Tuple1(0L)).toDF("item_id")
    // user 0 has seen 0,1; restricted to {0} with filterSeen → no recs;
    // users 1,2 haven't seen 0 → get it (even though item 2 outranks 0
    // globally for user 0 — the restriction must apply before the crop)
    val recs = new PopRec().fit(log)
      .predict(log, k = 1, items = Some(allowed)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recs == Map(1L -> 0L, 2L -> 0L))
    // NeighbourRec path: ItemKNN restricted to {2}
    val knn = new ItemKNN(numNeighbours = 2).fit(log)
      .predict(log, k = 2, items = Some(Seq(Tuple1(2L)).toDF("item_id")))
    assert(knn.select("item_id").as[Long].collect().toSet == Set(2L))
  }

  test("cold candidate items are filled at min(rating)·coldWeight, not dropped") {
    // item 9 never appears in the log; min warm popularity = 1/3 → fill 1/6
    val cand = Seq(Tuple1(0L), Tuple1(9L)).toDF("item_id")
    val m = new PopRec().fit(log)
    val recs = m.predict(log, k = 2, items = Some(cand))
    val u1 = recs.filter($"query_id" === 1L).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // user 1 (seen {1,2}): warm candidate 0 at 1/3, cold candidate 9 at 1/6
    assert(u1 == Map(0L -> 1.0 / 3, 9L -> 1.0 / 6))
    // addColdItems=false reverts to the semi-join restriction
    val dropped = new PopRec(addColdItems = false).fit(log)
      .predict(log, k = 2, items = Some(cand))
    assert(dropped.filter($"item_id" === 9L).isEmpty)
    // predictPairs follows the same contract (left+fill vs inner)
    val pairs = Seq((1L, 0L), (1L, 9L)).toDF("query_id", "item_id")
    val pp = m.predictPairs(pairs, log).collect()
      .map(r => r.getAs[Long]("item_id") -> r.getAs[Double]("rating")).toMap
    assert(pp == Map(0L -> 1.0 / 3, 9L -> 1.0 / 6))
    assert(new PopRec(addColdItems = false).fit(log)
      .predictPairs(pairs, log).count() == 1L)
  }

  test("coldWeight outside (0,1] is rejected") {
    intercept[IllegalArgumentException] {
      new PopRec(coldWeight = 0.0).fit(log)
    }
    intercept[IllegalArgumentException] {
      new PopRec(coldWeight = 1.5).fit(log)
    }
  }

  test("RandomRec predictProba tiles normalized weights; mass sums to 1 per position") {
    val m = new RandomRec("popular", seed = 42).fit(log)
    val p = m.predictProba(log, k = 2)
    // per-(query, position) mass sums to 1 (float-tolerant)
    val sums = p.groupBy("query_id", "position").agg(F.sum("prob").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-9))
    // position 0 is the exact first-draw probability: item 1 has count 3
    // of 6 interactions → 1/2
    val p1 = p.filter($"item_id" === 1L && $"position" === 0L)
      .select("prob").as[Double].first()
    assert(math.abs(p1 - 0.5) < 1e-12)
    // tiled: identical distribution at every position
    assert(p.select("position").distinct().count() == 2)
  }

  test("PopRec useRating sums ratings") {
    val weighted = Seq((0L, 0L, 5.0), (1L, 0L, 1.0), (1L, 1L, 3.0))
      .toDF("query_id", "item_id", "rating")
    val pop = new PopRec(useRating = true).fit(weighted).itemPopularity
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pop == Map(0L -> 3.0, 1L -> 1.5))
  }

  test("QueryPopRec profile is the user's interaction share") {
    val m = new QueryPopRec().fit(log)
    val p = m.queryProfile.filter($"query_id" === 0L).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(p == Map(0L -> 0.5, 1L -> 0.5))
  }

  test("Wilson lower bound is between 0 and p-hat") {
    val binary = Seq((0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 0.0),
      (0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val pop = new Wilson().fit(binary).itemPopularity.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pop(0L) > 0 && pop(0L) < 2.0 / 3)
    assert(pop(1L) > 0 && pop(1L) < 1.0)
  }

  test("UCB adds exploration bonus inversely related to trials") {
    val binary = Seq((0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0),
      (0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val pop = new UCB().fit(binary).itemPopularity.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both have p-hat=1; item 1 has fewer trials → larger bonus
    assert(pop(1L) > pop(0L))
  }

  test("UCBState refit equals fit on the union") {
    val b1 = Seq((0L, 0L, 1.0), (1L, 0L, 0.0)).toDF("query_id", "item_id", "rating")
    val b2 = Seq((2L, 0L, 1.0), (0L, 1L, 1.0)).toDF("query_id", "item_id", "rating")
    val incremental = new UCBState().fit(b1).refit(b2).state
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val full = new UCBState().fit(b1.unionByName(b2)).state
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(incremental == full)
  }

  test("KLUCB bound is above p-hat and below 1") {
    val binary = Seq((0L, 0L, 1.0), (1L, 0L, 0.0), (2L, 0L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val b = new KLUCB().fit(binary).itemPopularity.first().getDouble(1)
    assert(b > 2.0 / 3 && b < 1.0)
  }

  test("ThompsonSampling is deterministic under a fixed seed") {
    val binary = Seq((0L, 0L, 1.0), (1L, 0L, 0.0), (0L, 1L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val s1 = new ThompsonSampling(7).fit(binary).itemPopularity.collect().toSet
    val s2 = new ThompsonSampling(7).fit(binary).itemPopularity.collect().toSet
    assert(s1 == s2)
    val all = s1.map(_.getDouble(1))
    assert(all.forall(v => v >= 0 && v <= 1))
  }

  test("RandomRec returns k items per user, deterministic under seed") {
    val m = new RandomRec("popular", seed = 7).fit(log)
    val r1 = m.predict(log, k = 1, filterSeen = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = new RandomRec("popular", seed = 7).fit(log)
      .predict(log, k = 1, filterSeen = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2 && r1.size == 3)
  }

  test("RandomRec(popular) prefers heavy items (the sampling direction)") {
    // item 0 is 50x more popular than items 1..3 — it must win the top-1
    // slot for most (user, seed) draws; an inverted sampling key would
    // make it LOSE most draws
    val skewed = ((1 to 50).map(i => (i.toLong, 0L, 1.0)) ++
      Seq((1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0)))
      .toDF("query_id", "item_id", "rating")
    val wins = (0 until 10).map { s =>
      new RandomRec("popular", seed = s).fit(skewed)
        .predict(skewed, k = 1, filterSeen = false)
        .filter($"item_id" === 0L).count()
    }.sum
    val total = 10L * 50L // 10 seeds x 50 users
    assert(wins > total / 2, s"popular item won only $wins of $total slots")
  }

  test("ItemKNN cosine similarity golden values") {
    // items 1,2 co-occur for users 1,2; item 1 appears for 3 users, item 2 for 2
    val m = new ItemKNN(numNeighbours = 2).fit(log)
    val sims = m.similarity.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sims are rounded to 9dp before the neighbour window → 5e-10 tolerance
    // sim(1,2) = 2 / (sqrt(3)*sqrt(2))
    assert(math.abs(sims((1L, 2L)) - 2.0 / (math.sqrt(3) * math.sqrt(2))) < 5e-10)
    // sim(0,1) = 1 / (sqrt(1)*sqrt(3))
    assert(math.abs(sims((0L, 1L)) - 1.0 / math.sqrt(3)) < 5e-10)
    // symmetric
    assert(sims.contains((2L, 1L)) && sims((2L, 1L)) == sims((1L, 2L)))
  }

  test("ItemKNN predict scores candidates by summed similarity") {
    val recs = new ItemKNN(numNeighbours = 2).fit(log).predict(log, k = 1)
    // user 0 (seen 0,1) should get item 2 via sim(1,2)+sim(0,2)
    val u0 = recs.filter($"query_id" === 0L).first()
    assert(u0.getLong(1) == 2L)
  }

  test("AssociationRules confidence and lift golden values") {
    val sessions = Seq(
      (10L, 0L), (10L, 1L),
      (20L, 0L), (20L, 1L),
      (30L, 0L), (30L, 2L),
      (40L, 1L), (40L, 2L),
    ).map { case (s, i) => (s, i, s, 1.0) }
      .toDF("query_id", "item_id", "session_id", "rating")
    val m = new AssociationRules(minItemCount = 1, minPairCount = 1).fit(sessions)
    // antecedent=0 (3 sessions), consequent=1: pair=2 → conf=2/3, lift=4*conf/3
    val conf01 = m.rules.filter($"antecedent" === 0L && $"consequent" === 1L)
      .select("confidence").first().getDouble(0)
    assert(math.abs(conf01 - 2.0 / 3) < 1e-12)
    val lift01 = m.rules.filter($"antecedent" === 0L && $"consequent" === 1L)
      .select("lift").first().getDouble(0)
    assert(math.abs(lift01 - 4.0 * (2.0 / 3) / 3.0) < 1e-12)
  }

  test("SLIM fails fast when the driver collect would exceed its bound") {
    val sessions = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 0L, 1.0), (1L, 2L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val e = intercept[IllegalStateException] {
      new SLIM(maxCollectEntries = 2L, distributedFallback = false).fit(sessions)
    }
    assert(e.getMessage.contains("maxCollectEntries"))
  }

  test("SLIM distributed fallback matches the driver-CSC path exactly") {
    // integral ratings → distributed dot sums are exact, so the two paths
    // must produce bit-identical weights
    val binary = Seq(
      (0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L),
      (3L, 2L), (4L, 2L), (0L, 2L), (2L, 3L), (3L, 3L), (4L, 1L),
    ).map { case (u, i) => (u, i, 1.0) }.toDF("query_id", "item_id", "rating")
    def simMap(m: SLIM) = m.similarity.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val driver = simMap(new SLIM(maxIter = 30).fit(binary))
    val dist = simMap(
      new SLIM(maxIter = 30, maxCollectEntries = 1L).fit(binary))
    assert(dist == driver)
    assert(driver.nonEmpty)
  }

  test("Fallback merge ranks main recs above fallback recs") {
    val main = new PopRec()
    val fb = new RandomRec("uniform", seed = 1)
    val recs = new Fallback(main, fb).fit(log).predict(log, k = 2)
    assert(recs.groupBy("query_id").count().select("count").as[Long]
      .collect().forall(_ <= 2))
  }

  // Catalog wide enough that the threshold pre-crop engages
  // (n > preCropSafety·(k+maxSeen)); one heavy relevance item (rating 50
  // everywhere) exercises the solver's skew-doubling loop.
  private def wideLog = {
    val rows = for (u <- 0 until 40; j <- 0 until 5)
      yield (u.toLong, ((u * 7 + j * 13) % 300).toLong, ((u + j) % 5 + 1).toDouble)
    val heavy = (0 until 40).map(u => (u.toLong, 777L, 50.0))
    (rows ++ heavy).toDF("query_id", "item_id", "rating")
  }

  private def recsOf(m: RandomRec, df: org.apache.spark.sql.DataFrame) =
    m.fit(df).predict(df, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))

  test("RandomRec threshold pre-crop is exact: cropped ≡ uncropped per distribution") {
    val df = wideLog
    for (dist <- Seq("uniform", "popular", "relevance")) {
      val cropped = recsOf(new RandomRec(dist, seed = 5), df)
      val plain = new RandomRec(dist, seed = 5)
      plain.preCropEnabled = false
      assert(cropped.sameElements(recsOf(plain, df)),
        s"pre-crop changed $dist results")
      assert(cropped.nonEmpty)
    }
  }

  test("RandomRec pre-crop repair path: a degenerate threshold still yields exact results") {
    // a threshold that keeps (almost) nothing forces every query through
    // the unfiltered repair recompute — the exactness fallback
    val df = wideLog
    val broken = new RandomRec("popular", seed = 5)
    broken.forcedThreshold = Some(1e-12)
    val plain = new RandomRec("popular", seed = 5)
    plain.preCropEnabled = false
    assert(recsOf(broken, df).sameElements(recsOf(plain, df)),
      "repair path diverged from the uncropped sampler")
  }

  test("RandomRec native pair-hash path draws identically to the generic string path") {
    // long id columns dispatch to Md5Pair60 (single-block native MD5);
    // int ids fall back to the generic cast-to-string concat chain — the
    // decimal strings are identical, so the draws, recs, and ratings must
    // be too (the oracle-parity contract of the optimization)
    val intLog = log.select($"query_id".cast("int").as("query_id"),
      $"item_id".cast("int").as("item_id"), $"rating")
    val native = new RandomRec("popular", seed = 42).fit(log)
      .predict(log, k = 2, filterSeen = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val generic = new RandomRec("popular", seed = 42).fit(intLog)
      .predict(intLog, k = 2, filterSeen = false)
      .select($"query_id".cast("long"), $"item_id".cast("long"), $"rating")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == generic, "pair-hash optimization changed the draws")
    assert(native.nonEmpty)
  }

  test("RandomRec fast hash mode is deterministic and layout-independent") {
    val a = new RandomRec("popular", seed = 42, hashMode = "fast").fit(log)
      .predict(log, k = 2).collect().map(_.toSeq).toSet
    val b = new RandomRec("popular", seed = 42, hashMode = "fast")
      .fit(log.repartition(7)).predict(log.repartition(3), k = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b, "fast-hash sampling must not depend on partition layout")
    assert(a.nonEmpty)
    // unknown mode fails fast at plan build
    intercept[IllegalArgumentException] {
      new RandomRec("popular", hashMode = "bogus").fit(log).predict(log, k = 1)
    }
  }

  test("CatPopRec leaf closure flattens a 2-level tree") {
    val tree = Seq(("root", null.asInstanceOf[String]), ("a", "root"), ("b", "root"))
      .toDF("category", "parent_cat")
    val itemCats = Seq((0L, "a"), (1L, "a"), (2L, "b")).toDF("item_id", "category")
    val m = new CatPopRec(tree, itemCats)
    val closure = m.leafClosure.as[(String, String)].collect().toSet
    assert(closure.contains(("root", "a")) && closure.contains(("root", "b")))
    assert(closure.contains(("a", "a")))
  }
}

class ModelIOSpec extends graft.SparkSpec {
  import spark.implicits._

  def log = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 1L, 1.0))
    .toDF("query_id", "item_id", "rating")

  test("PopRec save/load roundtrip preserves popularity and predictions") {
    val dir = java.nio.file.Files.createTempDirectory("poprec").toString
    val m = new PopRec().fit(log)
    m.sample = true
    m.sampleSeed = 7L
    ModelIO.saveNonPersonalized(m, dir, "pop_rec")
    val loaded = ModelIO.loadPopRec(spark, dir)
    assert(loaded.itemPopularity.collect().map(_.toSeq).toSet ==
      m.itemPopularity.collect().map(_.toSeq).toSet)
    // the sampling mode round-trips (reference mutable `sample` attribute)
    assert(loaded.sample && loaded.sampleSeed == 7L)
    val recs = loaded.predict(log, k = 1)
    assert(recs.count() > 0)
    assert(recs.collect().map(_.toSeq).toSet ==
      m.predict(log, k = 1).collect().map(_.toSeq).toSet)
  }

  test("ItemKNN save/load roundtrip preserves similarity") {
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    val m = new ItemKNN(numNeighbours = 2).fit(log)
    ModelIO.saveNeighbour(m, dir, "item_knn")
    val loaded = ModelIO.loadItemKNN(spark, dir)
    assert(loaded.similarity.collect().map(_.toSeq).toSet ==
      m.similarity.collect().map(_.toSeq).toSet)
    assert(loaded.predict(log, k = 1).count() > 0)
  }

  test("Word2Vec save/load roundtrip preserves vectors and predictions") {
    val tlog = log.withColumn("timestamp",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2024-01-01 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("w2v").toString
    val m = new Word2VecRec(vectorSize = 4, ann = None).fit(tlog)
    ModelIO.saveWord2Vec(m, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    assert(loaded.itemVectors.count() == m.itemVectors.count())
    val a = m.predict(tlog, k = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = loaded.predict(tlog, k = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("Word2Vec with PqAnn round-trips its ann config and predicts after load") {
    val tlog = (for (u <- 0 until 8; i <- 0 until 6 if (u + i) % 3 != 0)
      yield (u.toLong, i.toLong, 1.0)).toDF("query_id", "item_id", "rating")
      .withColumn("timestamp",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2024-01-01 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("w2vpq").toString
    val m = new Word2VecRec(vectorSize = 4,
      ann = Some(new PqAnn(numSubspaces = 2, codebookSize = 2,
        candidatesPerQuery = 10, seed = 9))).fit(tlog)
    ModelIO.saveWord2Vec(m, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val ann = loaded.ann.collect { case p: PqAnn => p }
    assert(ann.isDefined, "pq config must round-trip")
    assert(ann.get.numSubspaces == 2 && ann.get.codebookSize == 2 &&
      ann.get.candidatesPerQuery == 10 && ann.get.seed == 9)
    val recs = loaded.predict(tlog, k = 2)
    assert(recs.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ <= 2))
    assert(recs.count() > 0)
  }

  test("load with wrong kind fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("wrong").toString
    ModelIO.saveNonPersonalized(new PopRec().fit(log), dir, "pop_rec")
    intercept[IllegalArgumentException] { ModelIO.loadItemKNN(spark, dir) }
  }

  // reference save_to_replay/load_from_replay (common.py:62-84): one
  // entry point that persists by runtime type and reloads by the saved
  // kind tag, without the caller naming the class
  test("generic save/load dispatches models by the persisted kind") {
    val m = new PopRec().fit(log)
    val dir = java.nio.file.Files.createTempDirectory("gen_pop").toString
    ModelIO.save(m, dir)
    val loaded = ModelIO.load(spark, dir)
    assert(loaded.isInstanceOf[PopRec])
    assert(loaded.asInstanceOf[PopRec].predict(log, k = 1)
      .collect().map(_.toSeq).toSet ==
      m.predict(log, k = 1).collect().map(_.toSeq).toSet)

    val knn = new ItemKNN().fit(log)
    val kdir = java.nio.file.Files.createTempDirectory("gen_knn").toString
    ModelIO.save(knn, kdir)
    assert(ModelIO.load(spark, kdir).isInstanceOf[ItemKNN])

    val baddir = java.nio.file.Files.createTempDirectory("gen_bad").toString
    intercept[IllegalArgumentException] { ModelIO.save("not a model", baddir) }
  }

  test("generic save/load routes splitter configs through SplitterIO") {
    import graft.splitters.{KFolds, RatioSplitter}
    val s = RatioSplitter(0.25)
    val dir = java.nio.file.Files.createTempDirectory("gen_split").toString
    ModelIO.save(s, dir)
    assert(ModelIO.load(spark, dir) == s) // case-class equality: full config

    val k = KFolds(3, seed = 11)
    val kdir = java.nio.file.Files.createTempDirectory("gen_kf").toString
    ModelIO.save(k, kdir)
    assert(ModelIO.load(spark, kdir) == k)
  }

  test("encoder round-trip preserves the mapping and the unknown-label policy") {
    import graft.preprocessing.{HandleUnknown, LabelEncoder}
    val e = LabelEncoder.fit(log, "item_id", HandleUnknown.UseDefault(-1L))
    val dir = java.nio.file.Files.createTempDirectory("gen_enc").toString
    ModelIO.save(e, dir)
    val loaded = ModelIO.load(spark, dir).asInstanceOf[LabelEncoder]
    assert(loaded.column == "item_id")
    assert(loaded.handleUnknown == HandleUnknown.UseDefault(-1L))
    assert(loaded.mapping.collect().map(_.toSeq).toSet ==
      e.mapping.collect().map(_.toSeq).toSet)
    // an unseen label hits the persisted policy, not the Error default
    val unseen = Seq((9L, 999L, 1.0)).toDF("query_id", "item_id", "rating")
    assert(loaded.transform(unseen).select("item_id")
      .collect().map(_.getLong(0)).toSeq == Seq(-1L))
  }

  def binary = Seq((0L, 0L, 1.0), (1L, 0L, 0.0), (2L, 0L, 1.0), (0L, 1L, 1.0))
    .toDF("query_id", "item_id", "rating")

  test("generic NonPersonalized loader round-trips every bandit kind") {
    for (m <- Seq(new Wilson().fit(binary), new UCB().fit(binary),
        new KLUCB().fit(binary), new ThompsonSampling(seed = 7).fit(binary))) {
      val dir = java.nio.file.Files.createTempDirectory("np").toString
      ModelIO.saveNonPersonalized(m, dir)
      val loaded = ModelIO.loadNonPersonalized(spark, dir)
      assert(loaded.getClass == m.getClass)
      assert(loaded.itemPopularity.collect().map(_.toSeq).toSet ==
        m.itemPopularity.collect().map(_.toSeq).toSet)
      // predict-equality incl. a COLD pair: the persisted fill must be
      // used verbatim (UCB's optimistic bound is not recomputable from
      // the popularity table alone)
      val pairs = Seq((0L, 0L), (0L, 9L)).toDF("query_id", "item_id")
      val a = m.predictPairs(pairs, binary).collect()
        .map(r => (r.getAs[Long]("item_id"), r.getAs[Double]("rating"))).toSet
      val b = loaded.predictPairs(pairs, binary).collect()
        .map(r => (r.getAs[Long]("item_id"), r.getAs[Double]("rating"))).toSet
      assert(a == b, s"predictPairs mismatch for ${m.getClass.getSimpleName}")
    }
  }

  test("generic Neighbour loader round-trips AssociationRules and SLIM") {
    // no item may appear in EVERY session (confidence_gain divides by
    // sessions-without-antecedent)
    val sessions = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L),
        (3L, 1L), (3L, 2L))
      .map { case (s, i) => (s, i, s, 1.0) }
      .toDF("query_id", "item_id", "session_id", "rating")
    val ar = new AssociationRules(minItemCount = 1, minPairCount = 1).fit(sessions)
    val dir1 = java.nio.file.Files.createTempDirectory("ar").toString
    ModelIO.saveNeighbour(ar, dir1)
    val lar = ModelIO.loadNeighbour(spark, dir1)
    assert(lar.isInstanceOf[AssociationRules])
    assert(lar.asInstanceOf[AssociationRules].rules.count() == ar.rules.count())
    assert(lar.predict(sessions, k = 1).collect().map(_.toSeq).toSet ==
      ar.predict(sessions, k = 1).collect().map(_.toSeq).toSet)

    val sl = new SLIM(maxIter = 5).fit(sessions)
    val dir2 = java.nio.file.Files.createTempDirectory("slim").toString
    ModelIO.saveNeighbour(sl, dir2)
    val lsl = ModelIO.loadNeighbour(spark, dir2)
    assert(lsl.isInstanceOf[SLIM])
    assert(lsl.similarity.collect().map(_.toSeq).toSet ==
      sl.similarity.collect().map(_.toSeq).toSet)
  }

  test("ALS round-trips through MLlib native save with ANN config") {
    val tlog = Seq((0, 0, 1.0f), (0, 1, 1.0f), (1, 1, 1.0f), (1, 2, 1.0f),
      (2, 0, 1.0f), (2, 2, 1.0f))
      .toDF("query_id", "item_id", "rating")
    val m = new ALSRec(rank = 2, maxIter = 2, seed = 11).fit(tlog)
    val dir = java.nio.file.Files.createTempDirectory("als").toString
    ModelIO.saveALS(m, dir)
    val loaded = ModelIO.loadALS(spark, dir)
    assert(loaded.rank == 2 && loaded.seed == 11 && loaded.ann.isEmpty)
    val pairs = Seq((0L, 2L), (1L, 0L)).toDF("query_id", "item_id")
    val a = m.predictPairs(pairs, tlog).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = loaded.predictPairs(pairs, tlog).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("re-saving a centroid-less Word2Vec clears a stale ivf_centroids dir") {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    // 12 items over enough users: |items| >= 4*nCentroids trains the IVF
    val big = (0L until 8L).flatMap(q => (0L until 12L).filter(i => (q + i) % 2 == 0)
      .map(i => (q, i, 1.0))).toDF("query_id", "item_id", "rating")
      .withColumn("timestamp", to_timestamp(lit("2024-01-01 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("w2v_stale").toString
    val trained = new Word2VecRec(vectorSize = 4,
      ann = Some(new IvfAnn(nCentroids = 2, nProbe = 1))).fit(big)
    ModelIO.saveWord2Vec(trained, dir)
    val centDir = java.nio.file.Paths.get(s"$dir/ivf_centroids")
    assert(java.nio.file.Files.exists(centDir), "trained IVF must persist centroids")
    // tiny catalog -> IVF exact fallback, centroidArrays None; re-save to
    // the SAME path must remove the stale dir or a later load silently
    // rebuilds from the OLD centroids
    val tlog = log.withColumn("timestamp", to_timestamp(lit("2024-01-01 10:00:00")))
    val untrained = new Word2VecRec(vectorSize = 4,
      ann = Some(new IvfAnn(nCentroids = 2, nProbe = 1))).fit(tlog)
    ModelIO.saveWord2Vec(untrained, dir)
    assert(!java.nio.file.Files.exists(centDir), "stale centroid dir must be cleared")
    assert(ModelIO.loadWord2Vec(spark, dir).predict(tlog, k = 1).count() > 0)
  }

  test("loaders restore non-default RecCols (QueryPop, RandomRec, ClusterRec)") {
    import org.apache.spark.sql.functions.lit
    val c = RecCols(query = "u", item = "i", rating = "r")
    val clog = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 1L, 1.0), (1L, 0L, 1.0))
      .toDF("u", "i", "r")

    val qp = new QueryPopRec(c).fit(clog)
    val d1 = java.nio.file.Files.createTempDirectory("qp_cols").toString
    ModelIO.saveQueryPop(qp, d1)
    val lqp = ModelIO.loadQueryPop(spark, d1)
    assert(lqp.cols == c)
    assert(lqp.predict(clog, k = 1).columns.contains("u"))

    val rr = new RandomRec("uniform", seed = 3, cols = c).fit(clog)
    val d2 = java.nio.file.Files.createTempDirectory("rr_cols").toString
    ModelIO.saveRandomRec(rr, d2)
    val lrr = ModelIO.loadRandomRec(spark, d2)
    assert(lrr.cols == c)
    assert(lrr.predict(clog, k = 1).collect().map(_.toSeq).toSet ==
      rr.predict(clog, k = 1).collect().map(_.toSeq).toSet)

    // loadClusterRec used to repartition on the DEFAULT query column —
    // an AnalysisException on any model fit with renamed columns
    val feats = Seq((0L, 0.0, 1.0), (1L, 5.0, 4.0)).toDF("u", "f1", "f2")
    val cr = new ClusterRec(nClusters = 2, cols = c).fit(clog, feats)
    val d3 = java.nio.file.Files.createTempDirectory("cr_cols").toString
    ModelIO.saveClusterRec(cr, d3)
    val lcr = ModelIO.loadClusterRec(spark, d3)
    assert(lcr.cols == c)
    assert(lcr.predict(clog, k = 1).collect().map(_.toSeq).toSet ==
      cr.predict(clog, k = 1).collect().map(_.toSeq).toSet)
  }

  test("QueryPopRec save/load roundtrip preserves the profile and predictions") {
    val dir = java.nio.file.Files.createTempDirectory("querypop").toString
    val m = new QueryPopRec().fit(log)
    ModelIO.saveQueryPop(m, dir)
    val loaded = ModelIO.loadQueryPop(spark, dir)
    assert(loaded.queryProfile.collect().map(_.toSeq).toSet ==
      m.queryProfile.collect().map(_.toSeq).toSet)
    assert(loaded.predict(log, k = 1, filterSeen = false).collect().map(_.toSeq).toSet ==
      m.predict(log, k = 1, filterSeen = false).collect().map(_.toSeq).toSet)
  }

  test("RandomRec save/load roundtrip preserves weights, hash mode, predictions") {
    val dir = java.nio.file.Files.createTempDirectory("randomrec").toString
    val m = new RandomRec("popular", alpha = 0.5, seed = 9).fit(log)
    ModelIO.saveRandomRec(m, dir)
    val loaded = ModelIO.loadRandomRec(spark, dir)
    assert(loaded.distribution == "popular" && loaded.alpha == 0.5 &&
      loaded.seed == 9L && loaded.hashMode == "portable")
    assert(loaded.itemWeights.collect().map(_.toSeq).toSet ==
      m.itemWeights.collect().map(_.toSeq).toSet)
    assert(loaded.predict(log, k = 1).collect().map(_.toSeq).toSet ==
      m.predict(log, k = 1).collect().map(_.toSeq).toSet)
  }

  test("CatPopRec save/load roundtrip: predict from closure + counts only") {
    val tree = Seq(("root", null.asInstanceOf[String]), ("a", "root"), ("b", "root"))
      .toDF("category", "parent_cat")
    val itemCats = Seq((0L, "a"), (1L, "a"), (2L, "b")).toDF("item_id", "category")
    val clog = Seq((0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 1L, 1.0), (3L, 2L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val m = new CatPopRec(tree, itemCats).fit(clog)
    val dir = java.nio.file.Files.createTempDirectory("catpop").toString
    ModelIO.saveCatPopRec(m, dir)
    val loaded = ModelIO.loadCatPopRec(spark, dir)
    val cats = Seq("root", "a").toDF("category")
    assert(loaded.predict(cats, k = 2).collect().map(_.toSeq).toSet ==
      m.predict(cats, k = 2).collect().map(_.toSeq).toSet)
  }

  test("ClusterRec save/load roundtrip: predict-after-load ≡ predict-before-save") {
    val qf = Seq((0L, 1.0, 2.0), (1L, 5.0, 1.0), (2L, 5.2, 1.1))
      .toDF("query_id", "f1", "f2")
    val clog = Seq((0L, 0L, 1.0), (0L, 1L, 1.0), (1L, 1L, 1.0), (2L, 2L, 1.0))
      .toDF("query_id", "item_id", "rating")
    val m = new ClusterRec(nClusters = 2, seed = 7).fit(clog, qf)
    val dir = java.nio.file.Files.createTempDirectory("cluster").toString
    ModelIO.saveClusterRec(m, dir)
    val loaded = ModelIO.loadClusterRec(spark, dir)
    assert(loaded.nClusters == 2 && loaded.seed == 7L)
    val a = m.predict(clog, k = 2).collect().map(_.toSeq).toSet
    val b = loaded.predict(clog, k = 2).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("LinUCB save/load roundtrip: predict-after-load ≡ predict-before-save") {
    val qf = Seq((0L, 1.0, 2.0), (1L, 5.0, 1.0), (2L, 3.0, 4.0))
      .toDF("query_id", "f1", "f2")
    val blog = Seq((0L, 0L, 1.0), (1L, 0L, 0.0), (2L, 1L, 1.0), (0L, 1L, 0.0))
      .toDF("query_id", "item_id", "rating")
    val m = new LinUCB(alpha = 0.5, lambdaReg = 2.0).fit(blog, qf)
    val dir = java.nio.file.Files.createTempDirectory("linucb").toString
    ModelIO.saveLinUCB(m, dir)
    val loaded = ModelIO.loadLinUCB(spark, dir)
    assert(loaded.alpha == 0.5 && loaded.lambdaReg == 2.0 && loaded.dimension == 2)
    val a = m.predict(qf, k = 2).collect().map(_.toSeq).toSet
    val b = loaded.predict(qf, k = 2).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("Word2Vec+IVF roundtrip rebuilds identical lists from persisted centroids") {
    val rnd = new scala.util.Random(3)
    val rows = (for (u <- 0L until 6L; i <- 0L until 10L; if rnd.nextBoolean())
      yield (u, i, 1.0)) ++ (0L until 10L).map(i => (99L, i, 1.0))
    val tlog = rows.toDF("query_id", "item_id", "rating")
      .withColumn("timestamp", F.to_timestamp(F.lit("2024-01-01 10:00:00")))
    // 10 items ≥ 4·nCentroids → the real quantizer trains (not the exact
    // fallback), so centroids genuinely persist
    val m = new Word2VecRec(vectorSize = 4, numPartitions = Some(1),
      ann = Some(new IvfAnn(nCentroids = 2, nProbe = 1))).fit(tlog)
    val dir = java.nio.file.Files.createTempDirectory("w2vivf").toString
    ModelIO.saveWord2Vec(m, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val ivfA = m.ann.get.asInstanceOf[IvfAnn]
    val ivfB = loaded.ann.get.asInstanceOf[IvfAnn]
    assert(ivfB.centroidArrays.isDefined)
    assert(ivfA.centroidArrays.get.map(_.toSeq).toSeq ==
      ivfB.centroidArrays.get.map(_.toSeq).toSeq)
    val a = m.predict(tlog, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = loaded.predict(tlog, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("Word2Vec persists the IVF seed in its ANN config") {
    val tlog = log.withColumn("timestamp",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2024-01-01 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("w2vseed").toString
    val m = new Word2VecRec(vectorSize = 4,
      ann = Some(new IvfAnn(nCentroids = 2, nProbe = 1, seed = 123))).fit(tlog)
    ModelIO.saveWord2Vec(m, dir)
    val loaded = ModelIO.loadWord2Vec(spark, dir)
    val ivf = loaded.ann.get.asInstanceOf[IvfAnn]
    assert(ivf.seed == 123 && ivf.nCentroids == 2 && ivf.nProbe == 1)
  }
}
