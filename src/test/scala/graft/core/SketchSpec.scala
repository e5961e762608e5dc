package graft.core

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key k appears k times, k = 1..20 (210 rows)
  private def stream = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    .toDF("item_id")

  private def estimates(depth: Int, width: Int): Map[Long, Long] = {
    val counters = Sketch.cmsCounters(stream, "item_id", depth, width)
    val keys = stream.distinct()
    Sketch.cmsEstimate(counters, keys, "item_id", depth, width)
      .as[(Long, Long)].collect().toMap
  }

  test("CMS never underestimates, at any width") {
    val exact = (1 to 20).map(k => k.toLong -> k.toLong).toMap
    for (width <- Seq(4, 16, 1024)) {
      val est = estimates(depth = 4, width = width)
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"width=$width key=$k est=${est(k)} < exact=$n")
      }
    }
  }

  test("CMS is exact when the sketch is wide enough to avoid collisions") {
    // 20 keys into 4×1024 cells: collision within EVERY row is vanishingly
    // unlikely under the seeded hash family — and deterministic, so this
    // either always passes or never does
    val exact = (1 to 20).map(k => k.toLong -> k.toLong).toMap
    assert(estimates(depth = 4, width = 1024) == exact)
  }

  test("CMS counters merge by per-cell addition (shard-parallel build)") {
    val (a, b) = (stream.filter($"item_id" <= 10), stream.filter($"item_id" > 10))
    val merged = Sketch.cmsMerge(
        Sketch.cmsCounters(a, "item_id", 4, 16),
        Sketch.cmsCounters(b, "item_id", 4, 16))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.cmsCounters(stream, "item_id", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("HLL registers are dense and mergeable by per-bucket max") {
    val all = (1L to 5000L).toDF("item_id")
    val (a, b) = (all.filter($"item_id" <= 3000), all.filter($"item_id" > 2000))
    val merged = Sketch.hllMerge(
        Sketch.hllRegisters(a, "item_id", p = 8),
        Sketch.hllRegisters(b, "item_id", p = 8))
      .as[(Long, Long)].collect().toMap
    val whole = Sketch.hllRegisters(all, "item_id", p = 8)
      .as[(Long, Long)].collect().toMap
    assert(whole.size == 256 && whole.keySet == (0L until 256L).toSet)
    assert(merged == whole)
  }

  test("grouped HLL: sparse registers match per-group dense builds; estimates track per-group truth") {
    val df = ((1L to 5000L).map(k => ("big", k)) ++
      (1L to 400L).map(k => ("small", k * 7)))
      .toDF("grp", "item_id").repartition(6)
    val sparse = Sketch.hllRegistersByGroup(df, Seq("grp"), "item_id", p = 8)
      .as[(String, Long, Long)].collect()
    // sparse rows never carry zero registers
    assert(sparse.forall(_._3 >= 1L))
    for (g <- Seq("big", "small")) {
      val dense = Sketch.hllRegisters(
          df.filter($"grp" === g).select("item_id"), "item_id", p = 8)
        .as[(Long, Long)].collect().filter(_._2 > 0).toMap
      val got = sparse.filter(_._1 == g).map(r => r._2 -> r._3).toMap
      assert(got == dense, s"group $g sparse != dense non-zeros")
      // per-group estimate equals the global estimator on the same slice
      val viaGroup = Sketch.hllEstimateByGroup(
          Sketch.hllRegistersByGroup(df, Seq("grp"), "item_id", p = 8),
          Seq("grp"), p = 8)
        .filter($"grp" === g).select("estimate").as[Double].head()
      val viaGlobal = Sketch.hllEstimate(
          Sketch.hllRegisters(df.filter($"grp" === g).select("item_id"),
            "item_id", p = 8), p = 8)
        .as[Double].head()
      assert(viaGroup == viaGlobal, s"group $g: $viaGroup != $viaGlobal")
    }
    // accuracy: both groups within 3 sigma (p=8: 19.5%)
    val est = Sketch.hllEstimateByGroup(
        Sketch.hllRegistersByGroup(df, Seq("grp"), "item_id", p = 8),
        Seq("grp"), p = 8)
      .as[(String, Double)].collect().toMap
    assert(math.abs(est("big") - 5000) / 5000 <= 0.195, est.toString)
    assert(math.abs(est("small") - 400) / 400 <= 0.195, est.toString)
    // shard merge: groupBy-max over two shard builds == whole build
    val (a, b) = (df.filter($"item_id" % 2 === 0), df.filter($"item_id" % 2 =!= 0))
    val merged = Sketch.hllRegistersByGroup(a, Seq("grp"), "item_id", p = 8)
      .unionByName(Sketch.hllRegistersByGroup(b, Seq("grp"), "item_id", p = 8))
      .groupBy("grp", "bucket").agg(F.max("register").as("register"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == sparse.toSet)
  }

  test("grouped histogram: sparse cells match per-group dense; relational quantiles match the driver walk") {
    val df = ((1 to 900).map(i => ("a", (i % 97).toDouble)) ++
      (1 to 300).map(i => ("b", (i % 31).toDouble * 3)))
      .toDF("grp", "v").repartition(5)
    val sparse = Sketch.histogramBinsByGroup(df, Seq("grp"), "v", 0.0, 100.0, 64)
      .as[(String, Long, Long)].collect()
    for (g <- Seq("a", "b")) {
      val dense = Sketch.histogramBins(df.filter($"grp" === g).select("v"),
          "v", 0.0, 100.0, 64)
        .as[(Long, Long)].collect().filter(_._2 > 0).toMap
      assert(sparse.filter(_._1 == g).map(r => r._2 -> r._3).toMap == dense,
        s"group $g cells diverge")
      // relational per-group quantiles == the driver-side walk per group
      val viaGroup = Sketch.histogramQuantilesByGroup(
          Sketch.histogramBinsByGroup(df, Seq("grp"), "v", 0.0, 100.0, 64),
          Seq("grp"), Seq(0.1, 0.5, 0.9), 0.0, 100.0, 64)
        .filter($"grp" === g).select("q", "estimate")
        .as[(Double, Double)].collect().toMap
      val viaDriver = Sketch.histogramQuantiles(
          dense.toSeq.toDF("bin", "counter"), Seq(0.1, 0.5, 0.9), 0.0, 100.0, 64)
        .as[(Double, Double)].collect().toMap
      assert(viaGroup == viaDriver, s"group $g: $viaGroup != $viaDriver")
    }
    // shard merge: groupBy-sum over two shard builds == whole build
    val (x, y) = (df.filter($"v" < 40), df.filter($"v" >= 40))
    val merged = Sketch.histogramBinsByGroup(x, Seq("grp"), "v", 0.0, 100.0, 64)
      .unionByName(Sketch.histogramBinsByGroup(y, Seq("grp"), "v", 0.0, 100.0, 64))
      .groupBy("grp", "bin").agg(F.sum("counter").as("counter"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == sparse.toSet)
  }

  test("HLL estimate lands within 3 sigma of the truth (p=8: 19.5%)") {
    for (n <- Seq(500L, 5000L, 50000L)) {
      val est = Sketch.hllEstimate(
        Sketch.hllRegisters(spark.range(n).select($"id".as("k")), "k", 8), 8)
        .as[Double].collect()(0)
      assert(math.abs(est - n) / n <= 0.195,
        s"n=$n estimate=$est error=${math.abs(est - n) / n}")
    }
  }

  test("HLL small range uses linear counting and is near-exact") {
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(Seq(1L, 2L, 3L).toDF("k"), "k", 8), 8)
      .as[Double].collect()(0)
    assert(math.abs(est - 3.0) <= 0.2, s"estimate=$est") // 256·ln(256/253)
  }

  test("CMS and HLL run as real streams (complete mode) and match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val keys = (1L to 200L) ++ (1L to 50L) // skew: 1..50 twice
    val batchCms = Sketch.cmsCounters(keys.toDF("item_id"), "item_id", 4, 16)
      .as[(Int, Long, Long)].collect().toSet

    val in = MemoryStream[Long]
    val q = Sketch.cmsCounters(in.toDF().toDF("item_id"), "item_id", 4, 16)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    in.addData(keys.take(100): _*); q.processAllAvailable()
    in.addData(keys.drop(100): _*); q.processAllAvailable()
    val streamed = spark.table("cms_stream")
      .as[(Int, Long, Long)].collect().toSet
    q.stop()
    assert(streamed == batchCms)

    // HLL: the sparse register aggregation is the streaming-safe part
    // (the dense range join is a batch read of the final state)
    val batchHll = Sketch.hllRegisters(keys.toDF("item_id"), "item_id", 8)
      .filter($"register" > 0L).as[(Long, Long)].collect().toSet
    val in2 = MemoryStream[Long]
    val q2 = { // same sparse agg the operator builds internally
      import graft.core.{PortableHash => PH}
      val h = PH.long(0L, F.col("item_id"))
      val low = 52
      val w = h.bitwiseAND(F.lit((1L << low) - 1L))
      val rho = F.when(w === 0L, F.lit(low + 1))
        .otherwise(F.lit(low) - (F.length(F.bin(w)) - F.lit(1)))
      in2.toDF().toDF("item_id")
        .select(F.shiftrightunsigned(h, low).as("bucket"), rho.as("_rho"))
        .groupBy("bucket").agg(F.max("_rho").cast("long").as("register"))
        .writeStream.format("memory").queryName("hll_stream")
        .outputMode("complete").start()
    }
    in2.addData(keys: _*); q2.processAllAvailable()
    val streamedHll = spark.table("hll_stream")
      .as[(Long, Long)].collect().toSet
    q2.stop()
    assert(streamedHll == batchHll)

    // Bloom: the sparse set-bit aggregation is the streaming-safe part,
    // like HLL's register max (dense range join = batch read of state)
    val batchBloom = Sketch.bloomBits(keys.toDF("item_id"), "item_id", 64, 3)
      .filter($"is_set" === 1L).as[(Long, Long)].collect().toSet
    val in3 = MemoryStream[Long]
    val q3 = {
      import graft.core.{PortableHash => PH}
      in3.toDF().toDF("item_id")
        .select(F.explode(F.array((0 until 3).map(r =>
          F.pmod(PH.long(r.toLong, F.col("item_id")), F.lit(64L))): _*)).as("bit"))
        .groupBy("bit").agg(F.max(F.lit(1L)).as("is_set"))
        .writeStream.format("memory").queryName("bloom_stream")
        .outputMode("complete").start()
    }
    in3.addData(keys: _*); q3.processAllAvailable()
    val streamedBloom = spark.table("bloom_stream")
      .as[(Long, Long)].collect().toSet
    q3.stop()
    assert(streamedBloom == batchBloom)
  }

  test("Bloom filter has no false negatives, at any width") {
    val inserted = (1L to 50L).toDF("item_id")
    for (m <- Seq(8, 64, 1024)) {
      val bits = Sketch.bloomBits(inserted, "item_id", m, 4)
      val verdicts = Sketch.bloomMayContain(bits, inserted.distinct(),
          "item_id", m, 4)
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts.size == 50 && verdicts.values.forall(identity),
        s"m=$m false negative among ${verdicts.filterNot(_._2).keys}")
    }
  }

  test("Bloom filter is dense and rejects most absent keys at sized width") {
    val bits = Sketch.bloomBits((1L to 50L).toDF("item_id"), "item_id", 1024, 4)
      .as[(Long, Long)].collect().toMap
    assert(bits.size == 1024 && bits.keySet == (0L until 1024L).toSet)
    // 50 keys × 4 hashes into 1024 bits: fpr ≈ (1−e^(−200/1024))⁴ ≈ 0.1%
    val absent = (1001L to 1200L).toDF("item_id")
    val fps = Sketch.bloomMayContain(
        Sketch.bloomBits((1L to 50L).toDF("item_id"), "item_id", 1024, 4),
        absent, "item_id", 1024, 4)
      .as[(Long, Boolean)].collect().count(_._2)
    assert(fps <= 5, s"$fps/200 false positives at fpr≈0.1% sizing")
  }

  test("Bloom bit tables merge by per-bit OR (shard-parallel build)") {
    val all = (1L to 100L).toDF("item_id")
    val (a, b) = (all.filter($"item_id" <= 60), all.filter($"item_id" > 40))
    val merged = Sketch.bloomMerge(
        Sketch.bloomBits(a, "item_id", 256, 4),
        Sketch.bloomBits(b, "item_id", 256, 4))
      .as[(Long, Long)].collect().toSet
    val whole = Sketch.bloomBits(all, "item_id", 256, 4)
      .as[(Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("CMS total mass per row equals the stream size") {
    val perRow = Sketch.cmsCounters(stream, "item_id", 4, 16)
      .groupBy("row").agg(F.sum("counter").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow == (0 until 4).map(_ -> 210L).toMap)
  }

  test("histogram runs as a real stream (complete mode) and matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val vals = (0 until 500).map(i => (i * 37 % 250).toDouble)
    val batch = Sketch.histogramBins(vals.toDF("v"), "v", 0.0, 250.0, 32)
      .as[(Long, Long)].collect().toSet
    val in = MemoryStream[Double]
    val q = Sketch.histogramBins(in.toDF().toDF("v"), "v", 0.0, 250.0, 32)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    in.addData(vals.take(200): _*); q.processAllAvailable()
    in.addData(vals.drop(200): _*); q.processAllAvailable()
    val streamed = spark.table("hist_stream").as[(Long, Long)].collect().toSet
    q.stop()
    assert(streamed == batch)
  }

  test("histogram bins clamp out-of-range values into the edge bins") {
    val df = Seq(-5.0, 0.0, 2.5, 9.99, 10.0, 42.0).toDF("v")
    val bins = Sketch.histogramBins(df, "v", lo = 0.0, hi = 10.0, bins = 10)
      .as[(Long, Long)].collect().toMap
    assert(bins(0L) == 2L) // -5 clamped + 0.0
    assert(bins(2L) == 1L) // 2.5
    assert(bins(9L) == 3L) // 9.99 + 10.0 (hi) clamped + 42 clamped
    assert(bins.values.sum == 6L)
  }

  test("degenerate histogram inputs: constant column → one bin; empty bounds → clear error") {
    // constant column: bounds gives hi == lo, which must produce the
    // trivial one-bin histogram instead of a width-zero require failure
    val const = Seq.fill(37)(4.2).toDF("v")
    val (lo, hi) = Sketch.bounds(const, "v")
    assert(lo == hi)
    val bins = Sketch.histogramBins(const, "v", lo, hi, 16)
      .as[(Long, Long)].collect().toMap
    assert(bins == Map(0L -> 37L))
    // and the quantile walk on that histogram returns the constant
    val est = Sketch.histogramQuantiles(bins.toSeq.toDF("bin", "counter"),
      Seq(0.5), lo, hi, 16).as[(Double, Double)].collect().toMap
    assert(est(0.5) == 4.2)
    // single row behaves the same
    val one = Sketch.histogramBins(Seq(7.0).toDF("v"), "v", 7.0, 7.0, 8)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(0L -> 1L))
    // empty (or all-null) input: a contract error, not an NPE
    val err = intercept[IllegalArgumentException] {
      Sketch.bounds(Seq.empty[Double].toDF("v"), "v")
    }
    assert(err.getMessage.contains("no non-null rows"))
  }

  test("histogram shard merge equals the whole-stream build, bit-exact") {
    val all = (1 to 900).map(i => (i % 97).toDouble)
    val whole = Sketch.histogramBins(all.toDF("v"), "v", 0.0, 100.0, 64)
      .as[(Long, Long)].collect().toSet
    val shards = all.grouped(300).map(s =>
      Sketch.histogramBins(s.toDF("v"), "v", 0.0, 100.0, 64)).toSeq
    val merged = Sketch.histogramMerge(shards: _*)
      .as[(Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("histogram quantile estimates stay within one bin width of the exact quantile") {
    val vals = (0 until 2000).map(i => (i * 37 % 1000).toDouble)
    val df = vals.toDF("v")
    val (lo, hi) = Sketch.bounds(df, "v")
    val hist = Sketch.histogramBins(df, "v", lo, hi, 128)
    val w = (hi - lo) / 128
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Sketch.histogramQuantiles(hist, qs, lo, hi, 128)
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.min(sorted.length - 1, (q * sorted.length).toInt))
      assert(math.abs(est(q) - exact) <= w + 1e-9,
        s"q=$q est=${est(q)} exact=$exact w=$w")
    }
    // q=0 and q=1 hit the populated range's edges
    val edges = Sketch.histogramQuantiles(hist, Seq(0.0, 1.0), lo, hi, 128)
      .as[(Double, Double)].collect().toMap
    assert(math.abs(edges(0.0) - lo) <= w && math.abs(edges(1.0) - hi) <= w)
  }

  // ---- Misra-Gries heavy hitters ----

  // heavy skew: key 999 appears 300 times amid 100 singletons (n = 400),
  // interleaved by a fixed coprime step so the heavy key isn't a prefix
  private val skewedSeq: Seq[Long] = {
    val raw = Seq.fill(300)(999L) ++ (1L to 100L)
    raw.zipWithIndex.sortBy(p => (p._2 * 137) % 401).map(_._1)
  }
  private def skewed = skewedSeq.toDF("item_id")

  test("MG exact regime: capacity >= distinct reproduces groupBy counts, err 0") {
    val got = Sketch.mgHeavyHitters(stream.repartition(5), "item_id", 64)
      .as[(Long, Long, Long)].collect()
    assert(got.forall(_._3 == 0L))
    assert(got.map(t => t._1 -> t._2).toMap ==
      (1 to 20).map(k => k.toLong -> k.toLong).toMap)
  }

  test("MG guarantee: est <= true <= est + n/(capacity+1), heavy key survives") {
    val truth = Map(999L -> 300L) ++ (1L to 100L).map(_ -> 1L)
    val n = 400L
    for (parts <- Seq(1, 7); cap <- Seq(4, 16)) {
      val got = Sketch.mgHeavyHitters(skewed.repartition(parts), "item_id", cap)
        .as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap
      val eps = n / (cap + 1)
      got.foreach { case (k, est) =>
        assert(est <= truth(k), s"cap=$cap parts=$parts over-counts $k")
        assert(truth(k) - est <= eps, s"cap=$cap parts=$parts bound broken at $k")
      }
      // any key with true count > n/(cap+1) MUST be reported
      truth.filter(_._2 > eps).keys.foreach(k =>
        assert(got.contains(k), s"cap=$cap parts=$parts lost heavy key $k"))
    }
  }

  test("MG merge theorem: shard summaries combine under the additive bound") {
    val (ha, hb) = skewedSeq.splitAt(200)
    val (a, b) = (ha.toDF("item_id"), hb.toDF("item_id"))
    val cap = 8
    val merged = Sketch.mgMerge(
      Sketch.mgSummaries(a, "item_id", cap)
        .unionAll(Sketch.mgSummaries(b, "item_id", cap)), cap)
      .as[(Long, Long, Long)].collect()
    val truth = Map(999L -> 300L) ++ (1L to 100L).map(_ -> 1L)
    merged.foreach { case (k, est, _) =>
      assert(est <= truth(k) && truth(k) - est <= 400L / (cap + 1))
    }
    assert(merged.map(_._1).contains(999L))
  }

  test("MG state and output stay bounded by capacity") {
    val cap = 4
    val parts = 7
    val summaries = Sketch.mgSummaries(skewed.repartition(parts), "item_id", cap)
    assert(summaries.count() <= cap.toLong * parts) // <= capacity per task
    assert(Sketch.mgHeavyHitters(skewed, "item_id", cap).count() <= cap.toLong)
  }

  test("MG drops null keys like groupBy") {
    val withNulls = stream.unionAll(
      Seq.fill(5)(Option.empty[Long]).toDF("item_id"))
    assert(Sketch.mgHeavyHitters(withNulls, "item_id", 64)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap ==
      (1 to 20).map(k => k.toLong -> k.toLong).toMap)
  }

  private def regsOf(ids: Seq[Long], p: Int) =
    Sketch.hllRegisters(ids.toDF("item_id"), "item_id", p)

  test("hllOverlap: identical sets give est_intersect == est_a and jaccard 1 EXACTLY") {
    // identical inputs build identical registers, so union == a == b and
    // inclusion-exclusion collapses with zero float residue
    val ids = (1L to 4000L).map(i => i * 7 % 10007)
    val r = Sketch.hllOverlap(regsOf(ids, 12), regsOf(ids, 12), 12)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(r._1 == r._3 && r._4 == r._1 && r._5 == 1.0, r.toString)
  }

  test("hllOverlap: disjoint sets estimate a near-empty intersection") {
    val r = Sketch.hllOverlap(
      regsOf((1L to 3000L), 12), regsOf((100001L to 103000L), 12), 12)
      .as[(Double, Double, Double, Double, Double)].head()
    // est_intersect error scales with the union (~6000): allow 3 sigma
    assert(r._4 <= 0.05 * r._3, s"intersect ${r._4} not near 0 (union ${r._3})")
    assert(r._5 <= 0.05, s"jaccard ${r._5} not near 0")
  }

  test("hllOverlap: partial overlap within tolerance of the exact counts") {
    val a = (1L to 6000L); val b = (3001L to 9000L) // exact inter 3000, union 9000
    val r = Sketch.hllOverlap(regsOf(a, 12), regsOf(b, 12), 12)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(math.abs(r._1 - 6000) <= 0.05 * 6000, s"est_a ${r._1}")
    assert(math.abs(r._2 - 6000) <= 0.05 * 6000, s"est_b ${r._2}")
    assert(math.abs(r._3 - 9000) <= 0.05 * 9000, s"est_union ${r._3}")
    assert(math.abs(r._4 - 3000) <= 0.20 * 3000, s"est_intersect ${r._4}")
    assert(math.abs(r._5 - 3000.0 / 9000.0) <= 0.07, s"jaccard ${r._5}")
  }

  test("hllOverlap: two empty sets give est_union 0 and jaccard 0 (not NULL/NaN)") {
    val r = Sketch.hllOverlap(
      regsOf(Seq.empty[Long], 12), regsOf(Seq.empty[Long], 12), 12)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(r._3 == 0.0, s"est_union ${r._3}")
    assert(r._5 == 0.0, s"J(∅,∅) convention is 0.0, got ${r._5}")
    assert(!r._5.isNaN)
  }

  private def countersOf(keys: Seq[Long], depth: Int, width: Int) =
    Sketch.cmsCounters(keys.toDF("item_id").repartition(3), "item_id",
      depth, width)

  test("cmsJoinSize: never under the true join size, exact when collision-free") {
    // skewed self-join: true size = Σ k² for k = 1..20
    val skew = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val exact = (1 to 20).map(k => k.toLong * k).sum
    val c = countersOf(skew, 4, 64)
    val est = Sketch.cmsJoinSize(c, c).as[Long].head()
    assert(est >= exact, s"est $est < exact $exact")
    // wide sketch: 20 distinct keys in 4×4096 cells — measured collision-free
    val wide = countersOf(skew, 4, 4096)
    assert(Sketch.cmsJoinSize(wide, wide).as[Long].head() == exact)
  }

  test("cmsJoinSize: A ⋈ B across different streams and the disjoint case") {
    // B holds keys 1..10 once each: true |A ⋈ B| = Σ_{k≤10} k = 55
    val skew = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val est = Sketch.cmsJoinSize(
      countersOf(skew, 4, 4096), countersOf(1L to 10L, 4, 4096)).as[Long].head()
    assert(est == 55L) // collision-free at this width (deterministic hashes)
    // disjoint key sets: at least one hash row has no shared bucket
    val dj = Sketch.cmsJoinSize(
      countersOf(1L to 10L, 4, 4096), countersOf(101L to 110L, 4, 4096))
      .as[Long].head()
    assert(dj == 0L)
  }

  test("cmsJoinSize: merged shard sketches estimate like the whole") {
    val skew = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val (s1, s2) = skew.splitAt(100)
    val merged = Sketch.cmsMerge(countersOf(s1, 4, 64), countersOf(s2, 4, 64))
    val whole = countersOf(skew, 4, 64)
    assert(Sketch.cmsJoinSize(merged, merged).as[Long].head()
      == Sketch.cmsJoinSize(whole, whole).as[Long].head())
  }

  test("ksStatistic: identical zero, shifted full, hand max, layout-stable") {
    def df(xs: Long*) = xs.toSeq.toDF("x")
    def ks(a: Seq[Long], b: Seq[Long], parts: Int = 3) =
      Sketch.ksStatistic(a.toDF("x").repartition(parts),
        b.toDF("x").repartition(parts), "x")
        .as[(Long, Long)].collect().head
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == ((3L, 0L)))
    // fully shifted supports: D = 1
    assert(ks(Seq(1L, 2L), Seq(10L, 11L)) == ((4L, 1000000L)))
    // hand: a={1,1,2,3}, b={2,3,3,4}: F_a=(.5,.75,1,1) F_b=(0,.25,.75,1)
    // → D at v=1: .5
    assert(ks(Seq(1L, 1L, 2L, 3L), Seq(2L, 3L, 3L, 4L))._2 == 500000L)
    assert(ks(Seq(1L, 1L, 2L, 3L), Seq(2L, 3L, 3L, 4L), parts = 1)
      == ks(Seq(1L, 1L, 2L, 3L), Seq(2L, 3L, 3L, 4L), parts = 7))
    intercept[IllegalArgumentException](
      Sketch.ksStatistic(df(1L), df().filter(F.col("x") > 0), "x"))
  }

  test("tvDistance: identical zero, disjoint full, hand halves, empty throws") {
    def h(cells: (Long, Long)*) = cells.toSeq.toDF("bin", "counter")
    def tv(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Sketch.tvDistance(a, b).as[(Long, Long)].collect().head
    val x = h(0L -> 5L, 1L -> 5L)
    assert(tv(x, x) == ((2L, 0L)))
    // disjoint supports → TVD exactly 1
    assert(tv(h(0L -> 3L), h(1L -> 7L)) == ((2L, 1000000L)))
    // hand: p = (.5, .5) vs q = (.8, .2) → ½(0.3 + 0.3) = 0.3
    assert(tv(x, h(0L -> 8L, 1L -> 2L)) == ((2L, 300000L)))
    intercept[IllegalArgumentException](tv(x, h(0L -> 0L)))
  }
}
