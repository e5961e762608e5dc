package graft.text

import org.apache.spark.sql.{functions => F}
import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetDocs = (0L until 30L).map(i =>
    (i, s"spark shuffle partition join agg spark data ${i % 3}"))
  // raw corpus: half target-like, half off-domain
  private val rawLike = (100L until 120L).map(i =>
    (i, s"spark join data shuffle agg partition ${i % 5}"))
  private val rawOff = (200L until 220L).map(i =>
    (i, s"banana apple orange kiwi mango pear ${i % 5}"))

  test("target-like raw docs score higher importance weights than off-domain docs") {
    val target = targetDocs.toDF("doc_id", "text")
    val raw = (rawLike ++ rawOff).toDF("doc_id", "text")
    val w = Dsir.logWeights(raw, target, buckets = 256)
      .as[(Long, Double)].collect().toMap
    val like = rawLike.map(d => w(d._1))
    val off = rawOff.map(d => w(d._1))
    assert(like.min > off.max,
      s"every target-like doc must outscore every off-domain doc: " +
        s"like.min=${like.min} off.max=${off.max}")
  }

  test("grams keep multiplicity: unigrams + bigrams") {
    val g = Seq((1L, "a a b")).toDF("doc_id", "text")
      .select(Dsir.grams(F.col("text")).as("g"))
      .as[Seq[String]].collect().head
    assert(g == Seq("a", "a", "b", "a a", "a b"), s"got $g")
    val single = Seq((1L, "solo")).toDF("doc_id", "text")
      .select(Dsir.grams(F.col("text")).as("g"))
      .as[Seq[String]].collect().head
    assert(single == Seq("solo"))
  }

  test("bucketLogRatio covers the full domain with finite smoothed values") {
    val target = targetDocs.toDF("doc_id", "text")
    val raw = rawOff.toDF("doc_id", "text")
    val lam = Dsir.bucketLogRatio(target, raw, buckets = 64)
      .as[(Long, Double)].collect()
    assert(lam.length == 64)
    assert(lam.forall { case (_, v) => !v.isNaN && !v.isInfinite })
  }

  test("log weights are bit-identical across input partition layouts") {
    val target = targetDocs.toDF("doc_id", "text")
    def run(parts: Int): Map[Long, Double] =
      Dsir.logWeights(
        (rawLike ++ rawOff).toDF("doc_id", "text").repartition(parts),
        target.repartition(3), buckets = 256)
        .as[(Long, Double)].collect().toMap
    assert(run(1) == run(7))
  }

  test("Gumbel resample returns exactly k rows ranked by the deterministic key") {
    val target = targetDocs.toDF("doc_id", "text")
    val w = Dsir.logWeights((rawLike ++ rawOff).toDF("doc_id", "text"),
      target, buckets = 256).cache()
    val r = Dsir.resample(w, k = 10, seed = 11)
      .orderBy("rank").as[(Long, Double, Double, Long)].collect()
    assert(r.length == 10)
    assert(r.map(_._4).toSeq == (1L to 10L))
    // the bounded-heap crop must agree with the brute-force key order
    val brute = w.withColumn("_gk",
        F.col("log_weight") - F.log(-F.log(F.lit(1.0) -
          graft.core.PortableHash.uniform(11, F.col("doc_id")))))
      .orderBy(F.col("_gk").desc, F.col("doc_id").asc)
      .limit(10).select("doc_id").as[Long].collect().toSeq
    assert(r.map(_._1).toSeq == brute)
    // with importance weights dominating the noise, selection should
    // favor target-like docs
    assert(r.count(_._1 < 200) >= 7,
      s"expected mostly target-like picks, got ${r.map(_._1).toSeq}")
  }
}
