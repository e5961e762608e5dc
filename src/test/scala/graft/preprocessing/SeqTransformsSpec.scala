package graft.preprocessing

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Pins SequenceGenerator and ArrayPadder against the reference doctests
  * (sequence_generator.py:31-63, padder.py:20-55). */
class SeqTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("SequenceGenerator reference doctest: prefix windows + next-item labels") {
    val df = Seq(
      (1L, 3L, 1L), (1L, 7L, 2L), (1L, 10L, 3L),
      (2L, 5L, 3L), (2L, 8L, 2L), (2L, 11L, 1L),
      (3L, 4L, 3L), (3L, 9L, 12L), (3L, 2L, 1L), (3L, 5L, 4L),
    ).toDF("user_id", "item_id", "timestamp")
    // the doctest runs unordered (pandas keeps input order); order by the
    // original row position to reproduce it exactly
    val withPos = df.withColumn("_pos",
      F.monotonically_increasing_id())
    val out = SequenceGenerator.transform(withPos,
        groupBy = Seq("user_id"), orderBy = Seq("_pos"),
        transformColumns = Seq("item_id", "timestamp"))
      .select("user_id", "item_id_list", "timestamp_list",
        "label_item_id", "label_timestamp")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList,
        r.getSeq[Long](2).toList, r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2.length)).toList
    assert(out == List(
      (1L, List(3L), List(1L), 7L, 2L),
      (1L, List(3L, 7L), List(1L, 2L), 10L, 3L),
      (2L, List(5L), List(3L), 8L, 2L),
      (2L, List(5L, 8L), List(3L, 2L), 11L, 1L),
      (3L, List(4L), List(3L), 9L, 12L),
      (3L, List(4L, 9L), List(3L, 12L), 2L, 1L),
      (3L, List(4L, 9L, 2L), List(3L, 12L, 1L), 5L, 4L)))
  }

  test("SequenceGenerator lenWindow bounds the prefix; getListLen emits sizes") {
    val df = (1 to 6).map(i => (1L, i.toLong)).toDF("user_id", "item_id")
    val out = SequenceGenerator.transform(df,
        groupBy = Seq("user_id"), orderBy = Seq("item_id"),
        transformColumns = Seq("item_id"), lenWindow = 2,
        getListLen = true)
      .orderBy("label_item_id")
      .collect().map(r => (r.getSeq[Long](1).toList, r.getLong(2), r.getInt(3)))
    assert(out.toList == List(
      (List(1L), 2L, 1), (List(1L, 2L), 3L, 2), (List(2L, 3L), 4L, 2),
      (List(3L, 4L), 5L, 2), (List(4L, 5L), 6L, 2)))
  }

  test("ArrayPadder reference doctest: right pad, right cut keeps the LAST elements") {
    val df = Seq(
      (1L, Seq(1L), Seq("a")),
      (1L, Seq(1L, 2L), Seq("a", "b")),
      (1L, Seq(1L, 2L, 4L), Seq("a", "b", "d")),
      (1L, Seq(1L, 2L, 4L, 6L), Seq("a", "b", "d", "f")),
      (2L, Seq(4L, 7L, 12L), Seq("d", "e", "m")),
      (2L, Seq(4L, 7L, 12L, 126L), Seq("d", "e", "m", "g")),
      (3L, Seq(1L, 2L, 3L, 4L, 5L), Seq("a", "b", "c", "d", "a")),
      (3L, Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq("a", "b", "c", "d", "a", "f")),
      (3L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L), Seq("a", "b", "c", "d", "a", "f", "e")),
    ).toDF("user_id", "timestamp", "item_id")
    val padded = ArrayPadder.transform(
      ArrayPadder.transform(df, Seq("timestamp"), arraySize = Some(5)),
      Seq("item_id"), paddingValue = "[PAD]", arraySize = Some(5))
    val got = padded.collect().map(r =>
      (r.getSeq[Long](1).toList, r.getSeq[String](2).toList))
      .sortBy(_._1.mkString(",")).toList
    val want = List(
      (List(1L, 0L, 0L, 0L, 0L), List("a", "[PAD]", "[PAD]", "[PAD]", "[PAD]")),
      (List(1L, 2L, 0L, 0L, 0L), List("a", "b", "[PAD]", "[PAD]", "[PAD]")),
      (List(1L, 2L, 4L, 0L, 0L), List("a", "b", "d", "[PAD]", "[PAD]")),
      (List(1L, 2L, 4L, 6L, 0L), List("a", "b", "d", "f", "[PAD]")),
      (List(4L, 7L, 12L, 0L, 0L), List("d", "e", "m", "[PAD]", "[PAD]")),
      (List(4L, 7L, 12L, 126L, 0L), List("d", "e", "m", "g", "[PAD]")),
      (List(1L, 2L, 3L, 4L, 5L), List("a", "b", "c", "d", "a")),
      (List(2L, 3L, 4L, 5L, 6L), List("b", "c", "d", "a", "f")),
      (List(3L, 4L, 5L, 6L, 7L), List("c", "d", "a", "f", "e")),
    ).sortBy(_._1.mkString(","))
    assert(got == want)
  }

  test("ArrayPadder: left pad, left cut, null as empty, max-size default") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(9L)), (3L, null.asInstanceOf[Seq[Long]]),
    ).toDF("id", "xs")
    val left = ArrayPadder.transform(df, Seq("xs"), paddingSide = "left",
      paddingValue = -1, arraySize = Some(2), cutSide = "left")
      .orderBy("id").collect().map(_.getSeq[Long](1).toList).toList
    assert(left == List(List(1L, 2L), List(-1L, 9L), List(-1L, -1L)))
    // arraySize=None resolves to the max length (3)
    val auto = ArrayPadder.transform(df, Seq("xs"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toList).toList
    assert(auto == List(List(1L, 2L, 3L), List(9L, 0L, 0L), List(0L, 0L, 0L)))
    // cutArray=false keeps long arrays intact
    val uncut = ArrayPadder.transform(df, Seq("xs"), arraySize = Some(2),
      cutArray = false)
      .orderBy("id").collect().map(_.getSeq[Long](1).toList).toList
    assert(uncut == List(List(1L, 2L, 3L), List(9L, 0L), List(0L, 0L)))
  }
}
