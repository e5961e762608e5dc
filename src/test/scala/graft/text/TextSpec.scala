package graft.text

import graft.SparkSpec
import org.apache.spark.sql.{Column, functions => F}

class TextSpec extends SparkSpec {
  import spark.implicits._

  def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "a"),
    (1L, "The  quick brown FOX jumps over the lazy dog", "a"), // normalized dup of 0
    (2L, "completely different content with no overlap here at all", "a"),
    (3L, "the quick brown fox jumps over the lazy cat", "b"), // near-dup of 0
  ).toDF("doc_id", "text", "source")

  test("tokenCount and meanTokenLength") {
    val r = docs.filter($"doc_id" === 0)
      .select(TextStats.tokenCount($"text"),
        TextStats.meanTokenLength($"text")).first()
    assert(r.getLong(0) == 9L)
    assert(math.abs(r.getDouble(1) - 35.0 / 9) < 1e-12) // 35 letters, 9 tokens
  }

  test("stopwordRatio counts list hits") {
    val r = docs.filter($"doc_id" === 0)
      .select(TextStats.stopwordRatio($"text", Seq("the", "over"))).first().getDouble(0)
    assert(math.abs(r - 3.0 / 9) < 1e-12) // the, over, the
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      (0L, "the cat and the dog in the house"),
      (1L, "der Hund und die Katze ist nicht da"),
      (2L, "xyzzy plugh qwerty"),
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextStats.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en" && out(1L) == "de" && out(2L) == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = docs.select($"doc_id", TextStats.fingerprint($"text"))
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(2L))
  }

  test("exact dedup groups normalized duplicates") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() == 3)
    val dupGroup = groups.filter($"n_docs" === 2).first()
    assert(dupGroup.getLong(1) == 0L) // canonical = min id
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text")
    assert(dups.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 0L)))
  }

  test("shingles of short docs are empty, not garbage") {
    val short = Seq((0L, "one two")).toDF("doc_id", "text")
    assert(short.select(F.size(Dedup.shingles($"text", 3))).first().getInt(0) == 0)
  }

  test("ngram Jaccard finds the near-dup pair within a block") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
      k = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 0,1 share source "a" and are identical after lowering → J=1.0
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    // doc 3 is in block "b" → never paired with 0 despite similarity
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("minhash LSH surfaces exact duplicates as candidates") {
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4)
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical docs always collide
    val sim = Dedup.minhashSimilarity(cand, docs, "doc_id", "text", 16)
    val s01 = sim.filter($"id_a" === 0L && $"id_b" === 1L).first().getDouble(2)
    assert(s01 == 1.0)
  }

  test("simhash of identical docs is equal; different docs differ") {
    val hs = docs.select($"doc_id", Dedup.simhash($"text", 16).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hs(0L) == hs(1L))
    assert(hs(0L) != hs(2L))
    assert(hs.values.forall(h => h >= 0 && h < (1L << 16)))
  }

  test("brute-force cosine topK is exact and deterministic") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f)),
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(top.map(_._1).toSeq == Seq(3L, 1L)) // closest by cosine
  }

  test("IVF search recall vs brute force on clustered data") {
    val rnd = new scala.util.Random(7)
    def cluster(cx: Double, cy: Double, n: Int, base: Int) =
      (0 until n).map(i => ((base + i).toLong,
        Array((cx + rnd.nextGaussian() * 0.05).toFloat, (cy + rnd.nextGaussian() * 0.05).toFloat)))
    val vecs = (cluster(1, 0, 20, 0) ++ cluster(0, 1, 20, 100) ++ cluster(-1, 0, 20, 200))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" === 0L || $"vec_id" === 100L)
    val bf = Similarity.bruteForceTopK(queries, vecs, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = new IvfIndex(nCentroids = 3, nProbe = 1, seed = 1).fit(vecs)
      .search(queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // within-cluster neighbors: IVF with 1 probe should recover most
    assert(ivf.intersect(bf).size >= 8)
  }

  test("planesFor scales with log2(n) and clamps to the Long bucket key") {
    assert(Similarity.planesFor(2000) == 13)       // ceil(log2 2000)=11, +2
    assert(Similarity.planesFor(1000000000L) == 32)
    assert(Similarity.planesFor(1) == 4)           // floor clamp
    assert(Similarity.planesFor(Long.MaxValue / 2) == 62) // bucket-key cap
    assert(Similarity.planesFor(2000, margin = 4) == 15)
  }

  test("IVF probesFor and PQ rerankFor grow with corpus size (10x audit rule)") {
    // calibrated to the measured >=0.95 recall@5 contract on the
    // unstructured gate corpus, with a +1-cell margin (the raw
    // measurements 6/8 at 500, 7/8 at 2000 sat within ~2% of the
    // threshold and flipped with k-means init layout)
    assert(IvfIndex.probesFor(500, 8) == 7)
    assert(IvfIndex.probesFor(2000, 8) == 8)
    assert(IvfIndex.probesFor(50000, 8) == 8)
    assert(IvfIndex.probesFor(100, 8) == 7)          // small-n floor
    assert(IvfIndex.probesFor(1L << 40, 8) == 8)     // clamps at nCentroids
    assert(PqIndex.rerankFor(500) == 48)
    assert(PqIndex.rerankFor(2000) == 120)
    assert(PqIndex.rerankFor(100000) == 6000)
    assert(PqIndex.rerankFor(10) == 48)              // floor
  }

  test("LSH candidate volume stays near-linear when planes follow planesFor") {
    // 4× the corpus with planes = planesFor(n) must grow candidates far
    // slower than the quadratic 16× a FIXED plane count would give —
    // the occupancy contract a 100 TB caller relies on
    // dims must exceed the plane count for sign cells to stay near-uniform
    // (planes > dims in a low-dim space collapse into correlated cells)
    val rnd = new scala.util.Random(11)
    def corpus(n: Int) = (0 until n).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def pairs(n: Int, planes: Int): Long =
      Similarity.lshCandidateStats(corpus(n), planes, tables = 2, dims = 16)
        .agg(F.sum("candidate_pairs")).as[Long].head()
    val small = pairs(512, Similarity.planesFor(512))    // planes=11
    val large = pairs(2048, Similarity.planesFor(2048))  // planes=13
    assert(small > 0, "sanity: some candidates at n=512")
    assert(large < 8 * math.max(small, 1),
      s"4x corpus must stay near-linear: $small -> $large")
    // the same 4x corpus under the SMALL-n plane count grows quadratically
    val unscaled = pairs(2048, Similarity.planesFor(512))
    assert(unscaled > large, "fixed planes must produce more candidates")
  }

  test("occupancy guard does not change lshNearDup results") {
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.1f * i, 0f, 0f)
                 else Array(0f, 0f, 1.0f, 0.1f * i)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    def run(guard: Boolean) =
      Similarity.lshNearDup(vecs, threshold = 0.5, planes = 4, tables = 2,
        dims = 4, guardOccupancy = guard)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run(true) == run(false))
  }

  test("multimodal REAL decode: PNG round-trip recovers the exact dimensions") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 7L, 48L, 95L, 200L).toDF("id")
    val pngs = Multimodal.syntheticPngs(ids, "id", maxDim = 48).repartition(3)
    // the payload is a genuine PNG (magic bytes), not fabricated metadata
    val first = pngs.orderBy("asset_id").select("content").head.getAs[Array[Byte]](0)
    assert((first(0) & 0xff) == 0x89 && first(1) == 'P' && first(2) == 'N' && first(3) == 'G')
    val meta = Multimodal.decodeImage(pngs)
      .select("asset_id", "width", "height", "decode_ok")
      .as[(Long, Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    Seq(0L, 1L, 7L, 48L, 95L, 200L).foreach { id =>
      val (_, w, h, ok) = meta(id)
      assert(ok, s"id=$id failed decode")
      assert(w == 1 + id % 48 && h == 1 + (id * 7) % 48, s"id=$id got ${w}x$h")
    }
  }

  test("multimodal REAL decode: corrupt bytes report decode_ok=false, no task failure") {
    import graft.multimodal.Multimodal
    val junk = Multimodal.fakeAssets(
      (1L to 5L).map(i => (i, s"not an image $i")).toDF("doc_id", "text"),
      "doc_id", "text") // UTF-8 bytes, not an image
    val out = Multimodal.decodeImage(junk)
      .select("decode_ok", "width").as[(Boolean, Option[Long])].collect()
    assert(out.length == 5)
    assert(out.forall { case (ok, w) => !ok && w.isEmpty })
  }

  test("multimodal decode stub: expression and mapPartitions paths agree") {
    import graft.multimodal.Multimodal
    val assets = Multimodal.fakeAssets(docs, "doc_id", "text")
    val a = Multimodal.decodeStub(assets).collect().map(_.toSeq).toSet
    val b = Multimodal.decodePartitioned(assets).collect().map(_.toSeq).toSet
    assert(a == b)
    val meta = Multimodal.decodePartitioned(assets)
    assert(meta.filter($"width" < 64 || $"width" >= 576).count() == 0)
  }

  test("resize planning preserves aspect ratio within the box") {
    import graft.multimodal.Multimodal
    val meta = Seq((1L, 200L, 100L), (2L, 50L, 300L), (3L, 10L, 10L))
      .toDF("asset_id", "width", "height")
    val out = Multimodal.resizeDims(meta, maxW = 128, maxH = 96)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((128L, 64L)))  // wide: width-bound, h = 100*128/200
    assert(out(2L) == ((16L, 96L)))   // tall: height-bound, w = 50*96/300
    assert(out(3L) == ((96L, 96L)))   // square scales to the tighter side
    // fits: out_w <= 128 always; out_h <= 96 on the height-bound branch
    assert(out.values.forall { case (w, h) => w <= 128L })
  }

  test("byte histogram is an L1-normalized per-asset feature") {
    import graft.multimodal.Multimodal
    val assets = Multimodal.fakeAssets(docs, "doc_id", "text")
    val feats = Multimodal.byteHistogram(assets).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 16)
      assert(math.abs(v.sum - 1.0) < 1e-9)
    }
  }

  test("block sampling covers the payload with fixed-size blocks") {
    import graft.multimodal.Multimodal
    val assets = Multimodal.fakeAssets(docs, "doc_id", "text")
    val blocks = Multimodal.sampleBlocks(assets, blockSize = 8, stride = 2)
    assert(blocks.filter($"block_len" > 8).count() == 0)
    assert(blocks.groupBy("asset_id").count().count() == 4)
  }

  test("repetitionRatio: 0 for all-distinct, rises with repeats") {
    val df = Seq((1L, "a b c d"), (2L, "spam spam spam spam"), (3L, "x x y z"))
      .toDF("id", "text")
      .select($"id", TextStats.repetitionRatio($"text").as("r"))
    val m = df.as[(Long, Double)].collect().toMap
    assert(m(1L) == 0.0 && m(2L) == 0.75 && m(3L) == 0.25)
  }

  test("redactPii scrubs emails and long digit runs, keeps prose") {
    val out = Seq("mail me at jo.doe+x@corp.io or 12345678, not 123456!")
      .toDF("text").select(TextStats.redactPii($"text")).as[String].head()
    assert(out == "mail me at <EMAIL> or <NUMBER>, not 123456!")
  }

  test("temperature sampling up-weights small sources; alpha=1 is natural") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1 to 10).map(i => (i + 100L, "small"))).toDF("doc_id", "source")
    // alpha=0.5: p_small = √10/(√90+√10) = 1/4 exactly; T = min(120, 40)
    val by = Mixing.sampleWithTemperature(docs, alpha = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(by == Map("big" -> 30L, "small" -> 10L)) // 3:1, not 9:1
    // alpha=1 keeps the natural distribution — nothing dropped
    assert(Mixing.sampleWithTemperature(docs, alpha = 1.0).count() == 100L)
    // alpha out of range fails fast
    intercept[IllegalArgumentException] {
      Mixing.sampleWithTemperature(docs, alpha = 0.0)
    }
  }

  test("sampleToMixture hits exact target proportions, largest feasible") {
    val corpus = (0L until 40L).map(i =>
      (i, if (i < 10) "web" else if (i < 20) "code" else "books", "t"))
      .toDF("doc_id", "source", "text")
    // books (20 docs) binds: T = min(10/.25, 10/.25, 20/.5) = 40
    val out = Mixing.sampleToMixture(corpus,
      Map("web" -> 0.25, "code" -> 0.25, "books" -> 0.5), seed = 1)
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("web" -> 10L, "code" -> 10L, "books" -> 20L))
    // tighter web supply: web binds, T = min(10/.5, 10/.25, 20/.25) = 20
    val out2 = Mixing.sampleToMixture(corpus,
      Map("web" -> 0.5, "code" -> 0.25, "books" -> 0.25), seed = 1)
    val by2 = out2.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(by2 == Map("web" -> 10L, "code" -> 5L, "books" -> 5L))
    // deterministic: same seed, same pick
    val again = Mixing.sampleToMixture(corpus,
      Map("web" -> 0.5, "code" -> 0.25, "books" -> 0.25), seed = 1)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      out2.select("doc_id").as[Long].collect().sorted.toSeq)
    // a target source missing from the corpus fails fast, not silently-empty
    val err = intercept[IllegalArgumentException] {
      Mixing.sampleToMixture(corpus, Map("web" -> 0.5, "papers" -> 0.5))
    }
    assert(err.getMessage.contains("papers"))
  }

  test("contamination: benchmark n-gram overlap per doc, 0 for short docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares 'the quick brown' etc
      (2L, "totally novel content here now"),
      (3L, "hi"),                           // < n tokens → 0 ngrams
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "the quick brown fox leaps")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 3L, 2L, 2.0 / 3)))  // 'the quick brown', 'quick brown fox' hit
    assert(got(2L) == ((2L, 3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 0L, 0L, 0.0)))
  }

  test("unigramLogProb: mean ln P(token) under corpus unigram counts") {
    val docs = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val got = TextStats.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // freqs: a → 2, b → 1, N = 3
    assert(math.abs(got(1L) - (math.log(2.0 / 3) + math.log(1.0 / 3)) / 2) < 1e-12)
    assert(math.abs(got(2L) - math.log(2.0 / 3)) < 1e-12)
    // the common-vocabulary doc scores strictly higher than the rare one
    val mixed = Seq((1L, "the cat sat"), (2L, "the cat ran"),
      (3L, "zqx wvu kjh")).toDF("doc_id", "text")
    val sc = TextStats.unigramLogProb(mixed, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(sc(1L) > sc(3L) && sc(2L) > sc(3L))
  }

  test("int8 quantization: codes bounded, max element hits ±127, error ≤ scale/2") {
    val vecs = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(2.0f, 2.0f, -2.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Byte](1).toArray, r.getDouble(2)))).toMap
    assert(q(0L)._1.toSeq == Seq(64, -127, 32, 0)) // 0.5/1.0*127=63.5 → 64
    assert(q(0L)._2 == 1.0 / 127)
    assert(q(1L)._1.forall(c => c >= -127 && c <= 127))
    assert(q(1L)._1.max == 127 && q(1L)._1.min == -127)
    assert(q(2L)._1.forall(_ == 0) && q(2L)._2 == 0.0)
    // round-trip error bound: |x - c·scale| ≤ scale/2 per element
    val rt = Quantize.requantized(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((id, dq) <- rt; (x, y) <- orig(id).zip(dq))
      assert(math.abs(x - y) <= math.max(q(id)._2 / 2, 1e-12),
        s"vec $id: $x vs $y exceeds half-step")
  }

  def pqClusters = {
    val rnd = new scala.util.Random(13)
    def cluster(c: Array[Double], n: Int, base: Int) =
      (0 until n).map(i => ((base + i).toLong,
        c.map(v => (v + rnd.nextGaussian() * 0.05).toFloat)))
    (cluster(Array(1, 0, 0, 0), 20, 0) ++
     cluster(Array(0, 1, 0, 0), 20, 100) ++
     cluster(Array(0, 0, 1, 0), 20, 200)).toDF("vec_id", "embedding")
  }

  test("PQ search equals brute force when the ADC crop keeps the whole catalog") {
    // rerank·k ≥ n ⇒ every item survives stage 1 and stage 2 re-scores
    // exactly — pins the explode/join/regroup plumbing independent of
    // quantization quality
    val vecs = pqClusters
    val queries = vecs.filter($"vec_id" === 0L || $"vec_id" === 100L)
    val bf = Similarity.bruteForceTopK(queries, vecs, 5)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(_.toSeq).toSet
    val pq = new PqIndex(numSubspaces = 2, codebookSize = 4, seed = 3).fit(vecs)
      .search(queries, k = 5, rerank = 12) // 60 ≥ 60-vector catalog
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(_.toSeq).toSet
    assert(pq == bf)
  }

  test("PQ tight-crop search equals brute force when ADC keeps the right cluster") {
    // codebookSize=4 collapses each cluster to ONE code, so ADC ties all
    // 20 own-cluster items at the top. rerank·k = 20 keeps them all (the
    // bounded heap crops at cluster granularity — exactly the PQ
    // contract), and the exact re-rank then reproduces brute force.
    val vecs = pqClusters
    val queries = vecs.filter($"vec_id" === 0L || $"vec_id" === 100L)
    val bf = Similarity.bruteForceTopK(queries, vecs, 5)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(_.toSeq).toSet
    val pq = new PqIndex(numSubspaces = 2, codebookSize = 4, seed = 3).fit(vecs)
      .search(queries, k = 5, rerank = 4) // 20 survivors of a 60-item catalog
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(_.toSeq).toSet
    assert(pq == bf)
  }

  test("PQ codes are deterministic under the seed") {
    val vecs = pqClusters
    def codesOf() = new PqIndex(numSubspaces = 2, codebookSize = 4, seed = 3)
      .fit(vecs).codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codesOf() == codesOf())
  }

  test("PQ sampled codebook training still encodes every vector, deterministically") {
    val vecs = pqClusters
    def idx() = new PqIndex(numSubspaces = 2, codebookSize = 4, seed = 3,
      trainFraction = 0.5).fit(vecs)
    val a = idx()
    assert(a.codes.count() == 60) // encoding covers the full corpus
    assert(a.codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      == idx().codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap)
    // the crop-covers-catalog exactness property is training-independent
    val queries = vecs.filter($"vec_id" === 0L)
    val bf = Similarity.bruteForceTopK(queries, vecs, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = a.search(queries, k = 5, rerank = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pq == bf)
  }

  private def gopherFlags(text: String): Map[String, Any] = {
    val df = Seq(Tuple1(text)).toDF("text")
      .select(TextStats.gopherRules(F.col("text"),
        minWords = 5, minStopwordHits = 0).as("g"))
    val row = df.select("g.*").collect()(0)
    df.select("g.*").columns.zip(row.toSeq).toMap
  }

  test("gopherRules thresholds hash and ellipsis ratios SEPARATELY") {
    // 50 words; 3 hashes (0.06) and 3 ellipses (0.06): each under 0.1 —
    // the paper's rule keeps it; a summed 0.12 would wrongly reject
    val words = (1 to 44).map(i => s"w$i").mkString(" ")
    val both = s"$words # # # ... ... ..."
    assert(gopherFlags(both)("symbol_ok") == true)
    // 6 hashes alone (0.12) must still reject
    val hashes = s"$words # # # # # #"
    assert(gopherFlags(hashes)("symbol_ok") == false)
  }

  test("gopherRules counts the Unicode ellipsis U+2026") {
    val words = (1 to 14).map(i => s"w$i").mkString(" ")
    // 6 unicode ellipses over 20 words = 0.3 > 0.1
    assert(gopherFlags(s"$words … … … … … …")("symbol_ok") == false)
    // and a line ending in '…' counts toward the ellipsis-line fraction
    assert(gopherFlags("one two three four five…")("ellipsis_ok") == false)
    assert(gopherFlags("one two three four five...")("ellipsis_ok") == false)
  }

  test("dedupLines drops corpus-frequent lines, keeps order, keeps all docs") {
    val docs = Seq(
      (1L, "alpha unique\nSHARED footer\nbeta unique"),
      (2L, "gamma unique\nshared   FOOTER"), // fingerprint-normalized match
      (3L, "shared footer"),                 // fully boilerplate
      (4L, "delta unique"),
    ).toDF("doc_id", "text")
    val m = Dedup.dedupLines(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) == (("alpha unique\nbeta unique", 2L))) // order preserved
    assert(m(2L) == (("gamma unique", 1L)))
    assert(m(3L) == (("", 0L)))      // fully-boilerplate doc still returned
    assert(m(4L) == (("delta unique", 1L)))
  }

  test("dedupLines counts DISTINCT docs: repetition within one doc survives") {
    val docs = Seq((1L, "echo line\necho line\necho line")).toDF("doc_id", "text")
    val m = Dedup.dedupLines(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == 3L) // 3 copies in ONE doc is not cross-doc boilerplate
  }

  test("substringDupStats flags cross-doc k-token spans, not within-doc") {
    val span = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),            // carries the span
      (2L, s"$span delta epsilon zeta eta theta"),// carries the span
      (3L, "unique words only never repeated anywhere at all ok fine"),
      (4L, s"$span $span"),                       // span twice IN ONE doc +
                                                  // cross-doc with 1 and 2
      (5L, "short doc"),                          // < k tokens: 0 windows
    ).toDF("doc_id", "text")
    val st = Dedup.substringDupStats(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // doc 1: 11 tokens -> 4 windows; exactly 1 is the shared span
    assert(st(1L) == ((4L, 1L, true)))
    assert(st(2L)._3 && st(2L)._2 >= 1L)
    assert(st(3L) == ((3L, 0L, false)))           // 10 tokens -> 3 windows
    assert(st(4L)._3)
    assert(st(5L) == ((0L, 0L, false)))
    // within-doc-only repetition is NOT cross-doc: a doc repeating its own
    // unique span with no second document stays clean
    val solo = Seq((9L, ("own span tokens one two three four five " * 2).trim))
      .toDF("doc_id", "text")
    val soloSt = Dedup.substringDupStats(solo, "doc_id", "text", k = 8)
      .collect()(0)
    assert(!soloSt.getBoolean(3))
  }

  test("removeDuplicateSpans drops covered tokens, keeps order, counts") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $span omega"),
      (2L, s"pre $span post tail words"),
      (3L, "completely unrelated text with enough tokens here ok"),
    ).toDF("doc_id", "text")
    val m = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: windows at pos 0..2; only the exact span window (pos 1) is
    // cross-doc, covering tokens 1..8 -> "alpha" and "omega" survive
    assert(m(1L) == (("alpha omega", 10L, 8L)))
    assert(m(2L)._3 == 8L && m(2L)._1.startsWith("pre") &&
      m(2L)._1.endsWith("post tail words"))
    assert(m(3L) == (("completely unrelated text with enough tokens here ok", 8L, 0L)))
  }

  test("GPT-2 pre-tokenizer: words, numbers, punctuation, contractions") {
    def pre(s: String): Seq[String] =
      Seq(s).toDF("text").select(TextStats.preTokens($"text"))
        .as[Seq[String]].collect()(0)
    assert(pre("Hello, world! I'm testing 123 naïve…") ==
      Seq("Hello", ",", " world", "!", " I", "'m", " testing", " 123",
        " naïve", "…"))
    // single inter-word spaces attach to the next chunk; multi-space and
    // newline runs surface as whitespace tokens (the no-lookahead
    // deviation documented on PreTokenPattern)
    assert(pre("a  b\nc") == Seq("a", "  ", "b", "\n", "c"))
    assert(pre("don't we'll") == Seq("don", "'t", " we", "'ll"))
    // pre-token count >= whitespace token count on punctuation-heavy text
    val punct = "end. of. sentence. (with) [brackets]!"
    val nPre = pre(punct).size
    assert(nPre.toLong >= punct.split("\\s+").length)
  }

  test("Bloom-accelerated newKeys equals the plain anti-join at any width") {
    val batch = (1L to 300L).map(i => (i, s"key_$i")).toDF("row_id", "k")
    val seen = (1L to 300L).filter(_ % 3 == 0).map(i => s"key_$i").toDF("k")
    val expected = batch.join(seen, Seq("k"), "left_anti")
      .select("row_id").as[Long].collect().toSet
    // m=16: nearly every bit set, almost everything routes through the
    // exact check; m=4096: most new keys skip it — answer identical
    for (m <- Seq(16, 256, 4096)) {
      val got = Dedup.newKeys(batch, seen, "k", numBits = m, numHashes = 3)
        .select("row_id").as[Long].collect().toSet
      assert(got == expected, s"numBits=$m diverged from the anti-join")
    }
  }

  test("gopherRules alpha check accepts any Unicode letter") {
    // accented + Cyrillic + CJK words all count as alphabetic
    assert(gopherFlags("café müller Москва 東京 naïve")("alpha_ok") == true)
    // digit-only tokens do not
    assert(gopherFlags("11 22 33 44 55")("alpha_ok") == false)
  }

  private def c4(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(TextStats.c4Rules(F.col("text")).as("c"))
      .select("c.*").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("c4Rules keeps only terminal-punctuation lines with enough words") {
    val r = c4("no punctuation line here at all\n" +
      "This proper sentence has six words.\n" +
      "Short one.\n" +
      "Does a question mark also terminate lines?\n" +
      "A javascript mention drops this line fast.")
    assert(r("n_lines") == 5L && r("n_lines_kept") == 2L)
    assert(r("cleaned_text") == "This proper sentence has six words.\n" +
      "Does a question mark also terminate lines?")
    assert(r("n_sentences") == 2L)
  }

  test("c4Rules page flags: lorem ipsum, curly brace, bad words") {
    assert(c4("A fine sentence with lorem ipsum inside.")("lorem_ok") == false)
    assert(c4("A config block { appears on this page.")("brace_ok") == false)
    assert(c4("An obscene word poisons the whole page.")("bad_word_ok") == false)
    val clean = c4("First good sentence sits right here. Second good " +
      "sentence follows directly after. Third good sentence closes the page.")
    assert(clean("keep") == true && clean("n_sentences") == 3L)
  }

  test("chunkDocuments: overlap invariant, remainder chunk, full coverage") {
    val words = (0 until 100).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "tiny doc"), (3L, "  "))
      .toDF("doc_id", "text")
    val chunks = TextStats.chunkDocuments(docs, "doc_id", "text",
        chunkSize = 10, overlap = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()
    val d1 = chunks.filter(_._1 == 1L)
    // step 7: ceil(97/7) = 14 chunks; last = 100 - 7*13 = 9 tokens
    assert(d1.length == 14 && d1.last._4 == 9L)
    assert(d1.init.forall(_._4 == 10L))
    // consecutive chunks share exactly the 3-token overlap
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(" ").takeRight(3).toSeq ==
        b._3.split(" ").take(3).toSeq)
    }
    // stepping by (chunkSize - overlap) covers every token exactly once
    val covered = d1.init.flatMap(_._3.split(" ").take(7)) ++
      d1.last._3.split(" ")
    assert(covered.toSeq == words)
    // short doc -> one whole-doc chunk; blank doc -> no chunks
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "tiny doc", 2L)))
    assert(!chunks.exists(_._1 == 3L))
  }

  test("perplexityBuckets: equal-mass terciles, fluent docs in head, layout-stable") {
    // 30 docs with graded fluency: doc i repeats common words i times and
    // rare words (30-i) times, so logprob increases with i
    val docs = (0L until 30L).map { i =>
      val common = Seq.fill(i.toInt + 1)("the data row").mkString(" ")
      val rare = Seq.fill(30 - i.toInt)(s"zq${i}x").mkString(" ")
      (i, s"$common $rare")
    }.toDF("doc_id", "text")
    val b = TextStats.perplexityBuckets(docs, "doc_id", "text")
      .as[(Long, Double, String)].collect()
    val byBucket = b.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket("tail") == 10 && byBucket("middle") == 10 &&
      byBucket("head") == 10, s"terciles: $byBucket")
    // the head bucket holds the highest scores
    val headMin = b.filter(_._3 == "head").map(_._2).min
    val midMax = b.filter(_._3 == "middle").map(_._2).max
    assert(headMin >= midMax)
    val b7 = TextStats.perplexityBuckets(docs.repartition(7), "doc_id", "text")
      .as[(Long, Double, String)].collect().toSet
    assert(b.toSet == b7)
  }

  test("lshPlan: steeper curves for higher thresholds, beats every alternative factorization") {
    // independently integrate the S-curve error for every factorization
    // and confirm the planner's choice is a global minimum
    def errOf(threshold: Double, b: Int, r: Int): Double = {
      val steps = 1000
      (0 until steps).map { i =>
        val s = (i + 0.5) / steps
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        if (s < threshold) 0.5 * p else 0.5 * (1.0 - p)
      }.sum / steps
    }
    for (t <- Seq(0.3, 0.5, 0.8); perms <- Seq(16, 64, 128)) {
      val (b, r) = Dedup.lshPlan(t, perms)
      assert(b * r <= perms && b >= 1 && r >= 1)
      val chosen = errOf(t, b, r)
      for (r2 <- 1 to perms; b2 = perms / r2; if b2 >= 1)
        assert(chosen <= errOf(t, b2, r2) + 1e-12,
          s"t=$t perms=$perms: ($b,$r) worse than ($b2,$r2)")
    }
    // higher threshold -> more rows per band (steeper curve)
    val r50 = Dedup.lshPlan(0.5, 128)._2
    val r90 = Dedup.lshPlan(0.9, 128)._2
    assert(r90 > r50, s"rows at t=0.9 ($r90) must exceed t=0.5 ($r50)")
  }

  test("hardNegatives: nearest non-positives, positives and self excluded, k kept under crowding") {
    // anchor 0 along e1; 1,2 = labeled positives hugging the anchor;
    // 3..5 = hard negatives at decreasing similarity; 6,7 = orthogonal
    val vecs = Seq(
      (0L, Seq(10.0, 0.0, 0.0)),
      (1L, Seq(9.9, 0.1, 0.0)), (2L, Seq(9.8, 0.2, 0.0)),   // positives
      (3L, Seq(9.0, 2.0, 0.0)), (4L, Seq(8.0, 4.0, 0.0)),
      (5L, Seq(6.0, 6.0, 0.0)),
      (6L, Seq(0.0, 0.0, 10.0)), (7L, Seq(0.0, 10.0, 0.0)),
    ).toDF("vec_id", "embedding")
    val anchors = vecs.filter($"vec_id" === 0L)
    val pos = Seq((0L, 1L), (0L, 2L)).toDF("anchor_id", "positive_id")
    val negs = Similarity.hardNegatives(anchors, vecs, pos, k = 3,
        maxPositives = 4)
      .orderBy("neg_rank")
      .as[(Long, Long, Double, Long)].collect()
    // the two positives crowd the top of the similarity list, yet k=3
    // negatives survive: 3, 4, 5 in similarity order
    assert(negs.map(_._2).toSeq == Seq(3L, 4L, 5L), s"got ${negs.toSeq}")
    assert(negs.map(_._4).toSeq == Seq(1L, 2L, 3L))
    assert(!negs.exists(n => n._2 == 0L || n._2 == 1L || n._2 == 2L))
  }

  test("editDistanceVerify confirms near-identical pairs and rejects distant ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"), // 1 word off
      (3L, "completely unrelated text about database shuffle partitions"),
    ).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val v = Dedup.editDistanceVerify(cand, docs, "doc_id", "text",
      threshold = 0.8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val near = v((1L, 2L))
    assert(near._3 == 3L, s"dog->cat is 3 edits, got ${near._3}")
    assert(near._5, "near-identical pair must verify as duplicate")
    assert(!v((1L, 3L))._5, "distant pair must be rejected")
    // normalization: case + whitespace runs do not count as edits
    val norm = Dedup.editDistanceVerify(
      Seq((1L, 2L)).toDF("id_a", "id_b"),
      Seq((1L, "A  B\tC"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(norm._3 == 0L && norm._4 == 1.0)
  }

  test("bigramLogProb scores common transitions above rare ones; short docs 0.0") {
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"), // repeated bigrams
      (2L, "sat the zebra cat quantum the sat"),   // rare transitions
      (3L, "solo"),                                // < 2 tokens
      (4L, "the cat sat the cat sat"),
    ).toDF("doc_id", "text")
    val lp = TextStats.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(lp(1L) > lp(2L),
      s"repeated-bigram doc must outscore rare transitions: $lp")
    assert(lp(3L) == 0.0)
    // deterministic across layouts (sorted-position fold)
    val lp7 = TextStats.bigramLogProb(docs.repartition(7), "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(lp == lp7)
  }

  test("c4Rules drops pages with fewer than three sentences in the KEPT text") {
    // two sentences survive line filtering -> page dropped even though
    // every page flag is clean
    val r = c4("One good sentence sits right here. A second one follows.\n" +
      "unterminated filler line with many words but no ending")
    assert(r("n_sentences") == 2L && r("sentences_ok") == false &&
      r("keep") == false)
  }

  test("corpusReport: volume, dup, PII, quality, language mix per source") {
    val corpus = Seq(
      // source a: a dup pair (whitespace-normalized), one PII doc, en+de
      (0L, "The quick brown  fox", "a", "en"),
      (1L, "the quick BROWN fox", "a", "en"), // fingerprint-dup of 0
      (2L, "write to me at someone@example.com today please", "a", "en"),
      (3L, "der Hund und die Katze", "a", "de"),
      // source b: single doc, phone-number PII
      (4L, "call 12345678 now", "b", "en"),
    ).toDF("doc_id", "text", "source", "lang")
    val r = TextStats.corpusReport(corpus)
      .collect().map(row => row.getString(0) -> row).toMap
    val a = r("a")
    assert(a.getLong(1) == 4L)               // n_docs
    assert(a.getLong(2) == 4 + 4 + 7 + 5)    // total_tokens
    assert(a.getLong(4) == 1L)               // n_dup_docs (pair counts once)
    assert(a.getLong(5) == 1L)               // n_pii_docs (email)
    assert(a.getLong(7) == 2L)               // n_langs
    assert(a.getString(9) == "en")           // top_lang (3 en vs 1 de)
    assert(math.abs(a.getDouble(8) - 20.0 / 4) < 1e-15) // mean_tokens
    val b = r("b")
    assert(b.getLong(1) == 1L && b.getLong(5) == 1L) // number PII
    assert(b.getString(9) == "en" && b.getLong(4) == 0L)
  }

  test("tokenBudgetSelect: prefix-fill stops at the first overflow") {
    // source s quality order: doc1 (6/9 stopwords → 1.0) ahead of doc0
    // (2/9 → 0.944) ahead of doc2 (no stopwords, 4 tokens → lenOk 0.3).
    // budget 14: doc1 (9 tokens) fits (cum 9), doc0 (9) overflows (cum
    // 18) and prefix-fill stops — doc2 (4 tokens) would fit under a
    // skip-ahead rule but is NOT taken.
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "s"),
      (1L, "and a cat naps in it for the day", "s"),
      (2L, "zz yy xx ww", "s"),
      (3L, "the tiny doc of it", "t"), // other source: own budget
    ).toDF("doc_id", "text", "source")
    val kept = Mixing.tokenBudgetSelect(corpus, budgetTokens = 14)
      .select($"source", $"doc_id", $"cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(kept.filter(_._1 == "s").map(_._2) == Set(1L))
    assert(kept.contains(("t", 3L, 5L)))
  }

  test("lexicalStats: hand-computed words/sentences/syllables/ttr/flesch") {
    // "The cat sat. The cat ran!" → 6 words, 2 sentences;
    // syllables: the(1) cat(1) sat.(1) the(1) cat(1) ran!(1) = 6;
    // distinct tokens: {The, cat, sat., ran!} = 4 (exact-token distinct)
    val r = Seq((0L, "The cat sat. The cat ran!")).toDF("doc_id", "text")
      .select(TextStats.lexicalStats($"text").as("lx"))
      .select($"lx.*").first()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(math.abs(r.getDouble(3) - 4.0 / 6) < 1e-15)
    val flesch = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(math.abs(r.getDouble(4) - flesch) < 1e-12)
    // fragment without terminator: one sentence, never divide-by-zero
    val f = Seq((1L, "no punctuation here")).toDF("doc_id", "text")
      .select(TextStats.lexicalStats($"text").as("lx")).select($"lx.*").first()
    assert(f.getLong(1) == 1L)
    // "beautiful" = eau+i+u → 3 vowel-group syllables
    val s3 = Seq((2L, "beautiful")).toDF("doc_id", "text")
      .select(TextStats.lexicalStats($"text").as("lx")).select($"lx.*").first()
    assert(s3.getLong(2) == 3L)
  }

  test("trainingTriples: adjacent positives, cross-doc negatives, ε-drop") {
    // 3 docs × 8 tokens at chunkSize=4 → 2 chunks each, 1 pair per doc
    val corpus = Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8"),
    ).toDF("doc_id", "text")
    val t = TextStats.trainingTriples(corpus, chunkSize = 4, overlap = 0)
      .as[(Long, Long, String, String, String)].collect()
    assert(t.length <= 3) // ≤ one pair per doc; own-doc draws dropped
    t.foreach { case (doc, cid, anchor, pos, neg) =>
      assert(cid == 0L)
      // positive is the NEXT chunk of the same doc
      assert(anchor.head == pos.head && anchor == s"${anchor.head}1 " +
        s"${anchor.head}2 ${anchor.head}3 ${anchor.head}4")
      assert(pos.endsWith("8"))
      // negative comes from a DIFFERENT document
      assert(neg.head != anchor.head)
    }
    // determinism: same seed → same triples
    val t2 = TextStats.trainingTriples(corpus, chunkSize = 4, overlap = 0)
      .as[(Long, Long, String, String, String)].collect()
    assert(t.sortBy(_._1).toSeq == t2.sortBy(_._1).toSeq)
  }

  test("snapshotDiff: added/removed/changed/unchanged, normalization-aware") {
    val prev = Seq(
      (0L, "same text"), (1L, "will change"), (2L, "gone soon"),
      (3L, "Spaced   Out"),
    ).toDF("doc_id", "text")
    val next = Seq(
      (0L, "same text"), (1L, "has changed"), (4L, "brand new"),
      (3L, "  spaced out "), // normalizes to prev's fingerprint
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(prev, next)
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "unchanged", 1L -> "changed", 2L -> "removed",
      3L -> "unchanged", 4L -> "added"))
  }

  test("corpusReport top_lang tie breaks by language code") {
    val corpus = Seq(
      (0L, "x", "s", "fr"), (1L, "y", "s", "de"),
    ).toDF("doc_id", "text", "source", "lang")
    val r = TextStats.corpusReport(corpus).collect()
    assert(r.length == 1 && r(0).getString(9) == "de")
  }

  test("stratifiedSample: exact ceil(frac·n) per stratum, layout-independent") {
    val rows = (0 until 100).map(i => (i.toLong, s"src${i % 3}"))
    val df = rows.toDF("doc_id", "source")
    val got = Mixing.stratifiedSample(df.repartition(7), Seq("source"), 0.2,
      Seq("doc_id")).as[(Long, String)].collect().toSet
    // strata sizes: src0=34, src1=33, src2=33 → ceil(0.2·n) = 7, 7, 7
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc == Map("src0" -> 7, "src1" -> 7, "src2" -> 7), bySrc.toString)
    // deterministic: same picks on a different layout
    val again = Mixing.stratifiedSample(df.repartition(2), Seq("source"), 0.2,
      Seq("doc_id")).as[(Long, String)].collect().toSet
    assert(got == again)
    // frac = 1 keeps everything
    assert(Mixing.stratifiedSample(df, Seq("source"), 1.0, Seq("doc_id"))
      .count() == 100)
    // IEEE overshoot guard: 0.07 · 100 = 7.000000000000001 must still
    // keep EXACTLY 7 per 100-row stratum, not 8
    val hundred = (0 until 100).map(i => (i.toLong, "one")).toDF("doc_id", "source")
    assert(Mixing.stratifiedSample(hundred, Seq("source"), 0.07,
      Seq("doc_id")).count() == 7)
  }

  test("sampleExactKPerGroup: min(k, group size) rows, deterministic, seed-sensitive") {
    // group sizes 34/33/33 with k=5 → 5 each; a 2-row group keeps both
    val rows = (0 until 100).map(i => (i.toLong, s"src${i % 3}")) ++
      Seq((100L, "tiny"), (101L, "tiny"))
    val df = rows.toDF("doc_id", "source")
    val got = Mixing.sampleExactKPerGroup(df.repartition(7), Seq("source"), 5,
      Seq("doc_id")).as[(Long, String)].collect().toSet
    val byGrp = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGrp == Map("src0" -> 5, "src1" -> 5, "src2" -> 5, "tiny" -> 2))
    assert(got.subsetOf(rows.toSet))
    // layout-independent pick
    val again = Mixing.sampleExactKPerGroup(df.repartition(2), Seq("source"), 5,
      Seq("doc_id")).as[(Long, String)].collect().toSet
    assert(got == again)
    // a different seed draws a different sample (same counts)
    val other = Mixing.sampleExactKPerGroup(df, Seq("source"), 5,
      Seq("doc_id"), seed = 99).as[(Long, String)].collect().toSet
    assert(other != got && other.size == got.size)
    intercept[IllegalArgumentException](
      Mixing.sampleExactKPerGroup(df, Seq("source"), 0, Seq("doc_id")))
  }

  test("large-star/small-star CC equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 80).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val viaLabels = Dedup.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      val viaStars = Dedup.connectedComponentsLS(edges)
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaLabels, s"trial $trial diverged")
    }
  }

  test("LS converges in O(log n) rounds on a chain where min-label needs diameter") {
    // a 200-node chain: min-label propagation moves labels ONE hop per
    // round (needs ~200 rounds — far past its maxIter); the star
    // alternation contracts it in ~log2(200) ≈ 8
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsLS(chain, maxIter = 12)
      .as[(Long, Long)].collect()
    assert(cc.length == 200 && cc.forall(_._2 == 0L),
      s"chain not collapsed to component 0 within 12 star rounds")
  }

  test("LS CC refuses to emit a malformed result when maxIter is exhausted") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsLS(chain, maxIter = 2)
    }
    assert(err.getMessage.contains("star-forest fixpoint"))
  }

  test("LS CC: empty edges, single edge, two components") {
    assert(Dedup.connectedComponentsLS(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
    assert(Dedup.connectedComponentsLS(Seq((5L, 2L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap == Map(5L -> 2L, 2L -> 2L))
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsLS(two).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("repeatToTarget: exact counts in both regimes, distinct rep indices") {
    // small source (3 docs, target 8): 2 full copies + 2 top-ups;
    // big source (10 docs, target 8): exact 8-subsample at rep 0
    val rows = (1L to 3L).map(i => (i, "small")) ++
      (11L to 20L).map(i => (i, "big"))
    val df = rows.toDF("doc_id", "source")
    val got = Mixing.repeatToTarget(df.repartition(5), Seq("source"), 8L,
      Seq("doc_id")).as[(Long, String, Long)].collect()
    assert(got.count(_._2 == "small") == 8)
    assert(got.count(_._2 == "big") == 8)
    // every small doc appears 2 or 3 times, reps densely 0..n-1
    val bySmall = got.filter(_._2 == "small").groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(bySmall.values.forall(r => r == (0L until r.size).toSeq))
    assert(bySmall.values.map(_.size).toSeq.sorted == Seq(2, 3, 3))
    // big source: 8 distinct docs, all rep 0
    val byBig = got.filter(_._2 == "big")
    assert(byBig.map(_._1).distinct.size == 8 && byBig.forall(_._3 == 0L))
    // deterministic across layouts
    val again = Mixing.repeatToTarget(df.repartition(1), Seq("source"), 8L,
      Seq("doc_id")).as[(Long, String, Long)].collect()
    assert(got.toSet == again.toSet)
    intercept[IllegalArgumentException](
      Mixing.repeatToTarget(df, Seq("source"), 0L, Seq("doc_id")))
  }

  test("labelCentroids: exact code sums, signed ppm mean, zero vector") {
    import graft.text.Quantize
    val vecs = Seq(
      (1L, Array(1.0f, -1.0f)),   // codes 127, -127
      (1L, Array(0.5f, 1.0f)),    // codes 64 (half-up), 127
      (2L, Array(-1.0f, 0.0f)),   // codes -127, 0
      (3L, Array(0.0f, 0.0f)))    // zero vector: all-zero codes
      .toDF("label", "vec")
    val r = Quantize.labelCentroids(vecs.repartition(3), "label", "vec")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(r((1L, 0L)) == ((2L, 191L, 95500000L)))
    assert(r((1L, 1L)) == ((2L, 0L, 0L)))
    assert(r((2L, 0L)) == ((1L, -127L, -127000000L)))
    assert(r((3L, 0L)) == ((1L, 0L, 0L)) && r((3L, 1L)) == ((1L, 0L, 0L)))
  }

  test("sampleWeightedKPerGroup: exact counts, weight dominance, determinism") {
    import graft.text.Mixing
    val rows = for (g <- Seq("a", "b"); i <- 1L to 20L)
      yield (g, i, if (i == 7L) 1e9 else 1.0)
    val df = rows.toDF("g", "id", "w")
    def pick(parts: Int) = Mixing.sampleWeightedKPerGroup(
        df.repartition(parts), Seq("g"), 5, "w", Seq("id"))
      .select("g", "id").as[(String, Long)].collect().toSet
    val r = pick(3)
    assert(r == pick(1)) // layout-independent
    assert(r.count(_._1 == "a") == 5 && r.count(_._1 == "b") == 5)
    // the 1e9-weight row dominates: ln(u)/1e9 ≈ 0 beats every unit weight
    assert(r.contains(("a", 7L)) && r.contains(("b", 7L)))
    intercept[Exception](Mixing.sampleWeightedKPerGroup(
      Seq(("a", 1L, 0.0)).toDF("g", "id", "w"), Seq("g"), 1, "w",
      Seq("id")).collect())
  }

  test("keywords: exact tf/df scores, tie order, per-doc crop") {
    import graft.text.Retrieval
    val docs = Seq(
      (1L, "apple apple banana nice"),
      (2L, "banana cherry nice nice"),
      (3L, "ab delta echo")) // "ab" dropped by minLen
      .toDF("doc_id", "text")
    val r = Retrieval.keywords(docs.repartition(3), k = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._6) -> ((t._2, t._5))).toMap
    assert(r((1L, 1L)) == (("apple", 2000000L))) // tf2 df1
    assert(r((1L, 2L)) == (("banana", 500000L))) // tie with nice: term asc
    assert(r((2L, 1L)) == (("cherry", 1000000L))) // tie at 1e6: cherry<nice
    assert(r((2L, 2L)) == (("nice", 1000000L)))
    assert(r((3L, 1L))._1 == "delta" && r((3L, 2L))._1 == "echo")
    assert(r.size == 6)
  }
}
