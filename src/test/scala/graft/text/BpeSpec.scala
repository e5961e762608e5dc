package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the paper's worked vocabulary (Sennrich et al. 2016 §3.2):
  // low×5, lower×2, newest×6, widest×3
  private def sennrich: org.apache.spark.sql.DataFrame = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("golden merges on the paper vocabulary (count desc, pair asc ties)") {
    val merges = Bpe.train(sennrich, numMerges = 5)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (0L, "e", "s", 9L),
      (1L, "es", "t", 9L),       // tie with (t,</w>) broken lexicographically
      (2L, "est", "</w>", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
    ), s"got $merges")
  }

  test("driver and distributed training paths produce identical merge tables") {
    val driver = Bpe.train(sennrich, numMerges = 12)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val dist = Bpe.train(sennrich, numMerges = 12, maxCollectWords = 0)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(driver == dist)
    assert(driver.nonEmpty)
  }

  test("applyMerge fuses leftmost-first, non-overlapping") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("l", "o", "l", "o"), "l", "o") ==
      Vector("lo", "lo"))
    assert(Bpe.applyMerge(Vector("x"), "a", "b") == Vector("x"))
    assert(Bpe.applyMerge(Vector.empty, "a", "b") == Vector.empty)
  }

  test("unseen word segments with learned subwords: lowest -> low + est") {
    val merges = Bpe.train(sennrich, numMerges = 5)
    val enc = Bpe.encode(Seq((7L, "lowest")).toDF("doc_id", "text"), merges)
      .as[(Long, Seq[String], Long, Long)].collect().head
    assert(enc == ((7L, Seq("low", "est"), 2L, 1L)), s"got $enc")
  }

  test("encode preserves pre-token order and counts across a multi-word doc") {
    val merges = Bpe.train(sennrich, numMerges = 5)
    val enc = Bpe.encode(
      Seq((1L, "newest lowest low")).toDF("doc_id", "text"), merges)
      .as[(Long, Seq[String], Long, Long)].collect().head
    // newest -> n e w est ; lowest -> low est ; low -> low
    assert(enc._2 == Seq("n", "e", "w", "est", "low", "est", "low"), s"got $enc")
    assert(enc._3 == 7L && enc._4 == 3L)
  }

  test("training stops when no pair repeats") {
    val merges = Bpe.train(Seq((0L, "ab cd")).toDF("doc_id", "text"),
      numMerges = 10)
    assert(merges.count() == 0)
  }
}
