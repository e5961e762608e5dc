package graft.text

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  def corpus = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana cherry date"),
    (2L, "apple apple apple apple"),
    (3L, "elderberry fig grape"),
    (4L, ""),
  ).toDF("doc_id", "text")

  test("postings carries tf and dl; empty docs have no postings") {
    val p = Retrieval.postings(corpus).as[(Long, String, Long, Long)]
      .collect().map { case (d, t, tf, dl) => ((d, t), (tf, dl)) }.toMap
    assert(p((0L, "apple")) == ((2L, 4L)))
    assert(p((0L, "banana")) == ((1L, 4L)))
    assert(p((2L, "apple")) == ((4L, 4L)))
    assert(!p.keySet.exists(_._1 == 4L))
    assert(p.size == 10) // 3+3+1+3
  }

  test("corpusStats counts every doc, including empty ones") {
    val s = Retrieval.corpusStats(corpus).first()
    assert(s.getLong(0) == 5L)
    assert(math.abs(s.getDouble(1) - 14.0 / 5) < 1e-12)
  }

  test("bm25 hand-computed score and ranking") {
    // query "apple": df=2, N=5 → idf = ln((5-2+0.5)/(2+0.5)+1) = ln(2.4)
    // doc2: tf=4, dl=4, avgdl=2.8 → sat = 4*2.2/(4+1.2*(0.25+0.75*4/2.8))
    // doc0: tf=2, dl=4           → sat = 2*2.2/(2+1.2*(0.25+0.75*4/2.8))
    val q = Seq((100L, "apple")).toDF("query_id", "text")
    val out = Retrieval.bm25TopK(corpus, q, k = 5)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect()
    val idf = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val norm = 1.0 - 0.75 + 0.75 * (4.0 / 2.8)
    def sat(tf: Double) = (tf * 2.2) / (tf + 1.2 * norm)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((100L, 2L), (100L, 0L))) // only docs containing "apple"
    assert(math.abs(out(0)._3 -
      BigDecimal(idf * sat(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(math.abs(out(1)._3 -
      BigDecimal(idf * sat(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(out.map(_._4).toSeq == Seq(1L, 2L))
  }

  test("bm25 multi-term query sums matched-term contributions only") {
    val q = Seq((7L, "banana date missingterm")).toDF("query_id", "text")
    val out = Retrieval.bm25TopK(corpus, q, k = 10)
      .as[(Long, Long, Double, Long)].collect().map(r => r._2 -> r._3).toMap
    // doc1 matches banana+date, doc0 matches banana only
    assert(out.keySet == Set(0L, 1L))
    assert(out(1L) > out(0L))
  }

  test("bm25 query term multiplicity is ignored") {
    val q1 = Seq((1L, "apple")).toDF("query_id", "text")
    val q2 = Seq((1L, "apple apple apple")).toDF("query_id", "text")
    val a = Retrieval.bm25TopK(corpus, q1, k = 5).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val b = Retrieval.bm25TopK(corpus, q2, k = 5).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(a == b)
  }

  test("maxDfFrac drops stopword-degree terms from the match set") {
    // "apple" is in 2/5 docs (0.4); cap at 0.3 keeps only rarer terms
    val q = Seq((1L, "apple cherry")).toDF("query_id", "text")
    val out = Retrieval.bm25TopK(corpus, q, k = 10, maxDfFrac = 0.3)
      .as[(Long, Long, Double, Long)].collect()
    // cherry (df=2, 0.4) also dropped → no matches at 0.3; at 0.5 both live
    assert(out.isEmpty)
    val loose = Retrieval.bm25TopK(corpus, q, k = 10, maxDfFrac = 0.5)
      .as[(Long, Long, Double, Long)].collect()
    assert(loose.map(_._2).toSet == Set(0L, 1L, 2L))
  }

  test("rrf fusion: shared docs outrank single-list docs; exact terms") {
    val l1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), k = 10).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    // doc 11: 1/62 + 1/61 tops doc 10: 1/61
    assert(out.head._2 == 11L)
    assert(math.abs(out.head._3 - (1.0 / 62 + 1.0 / 61)) == 0.0)
    val m = out.map(r => r._2 -> r._3).toMap
    assert(m(10L) == 1.0 / 61 && m(12L) == 1.0 / 63 && m(13L) == 1.0 / 62)
    // tie: docs 12 (rank3 list1) vs none — check deterministic doc order
    assert(out.map(_._2).toSeq == Seq(11L, 10L, 13L, 12L))
  }

  test("rrf tie on equal scores breaks by doc_id") {
    val l1 = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), k = 2).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(5L, 20L))
    assert(out(0)._3 == out(1)._3)
  }

  test("rrf crop keeps the k best per query") {
    val l1 = (1L to 20L).map(i => (1L, i, i)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l1), k = 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
