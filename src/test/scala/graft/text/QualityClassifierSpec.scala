package graft.text

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two vocabularies with a little overlap: separable but not trivial
  private val target = (0L until 40L).map(i =>
    (i, s"clean prose flows nicely with structure and meaning ${i % 5}"))
  private val raw = (100L until 180L).map(i =>
    (i, s"spam junk noise garble keyboard mash zzz ${i % 7} and ${i % 3}"))

  test("separable classes: AUC >= 0.95 and target scores dominate raw") {
    val clf = new QualityClassifier(buckets = 512)
      .fit(target.toDF("doc_id", "text"), raw.toDF("doc_id", "text"))
    val all = (target ++ raw).toDF("doc_id", "text")
    val scores = clf.score(all).as[(Long, Double)].collect().toMap
    val tMean = target.map(d => scores(d._1)).sum / target.size
    val rMean = raw.map(d => scores(d._1)).sum / raw.size
    assert(tMean > rMean + 0.3, s"target mean $tMean vs raw mean $rMean")
    val labels = (target.map(d => (d._1, 1)) ++ raw.map(d => (d._1, 0)))
      .toDF("doc_id", "label")
    val auc = clf.auc(clf.score(all), labels)
    assert(auc >= 0.95, s"AUC = $auc")
  }

  test("docs with no tokens score the no-signal 0.5") {
    val clf = new QualityClassifier(buckets = 256)
      .fit(target.take(10).toDF("doc_id", "text"),
        raw.take(10).toDF("doc_id", "text"))
    val s0 = clf.score(Seq((7L, "   ")).toDF("doc_id", "text"))
      .as[(Long, Double)].collect().head
    assert(s0 == ((7L, 0.5)))
  }

  test("shared doc_id across target and raw does not collapse in training") {
    // same ids in both frames (realistic: separate corpora with their own
    // id spaces) — the surrogate-id split must keep both rows
    val t = Seq((1L, "good clean structured prose here")).toDF("doc_id", "text")
    val r = Seq((1L, "zzz mash junk noise keyboard garble")).toDF("doc_id", "text")
    val clf = new QualityClassifier(buckets = 128).fit(t, r)
    val s = clf.score(
      Seq((10L, "good clean structured prose here"),
        (11L, "zzz mash junk noise keyboard garble")).toDF("doc_id", "text"))
      .as[(Long, Double)].collect().toMap
    assert(s(10L) > s(11L))
  }
}
