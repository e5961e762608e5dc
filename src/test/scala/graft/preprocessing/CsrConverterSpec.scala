package graft.preprocessing

import graft.SparkSpec

/** Pins CsrConverter against the reference doctest
  * (converter.py:17-45) and scipy's duplicate/shape/empty semantics. */
class CsrConverterSpec extends SparkSpec {
  import spark.implicits._

  private def doctestDf = Seq(
    (1L, 3L, 1.0), (1L, 7L, 2.0), (1L, 10L, 3.0),
    (2L, 5L, 3.0), (2L, 8L, 2.0), (2L, 11L, 1.0),
    (3L, 4L, 3.0), (3L, 9L, 12.0), (3L, 2L, 1.0), (3L, 5L, 4.0),
  ).toDF("user_id", "item_id", "rating")

  test("reference doctest: shape (4,12), dense values, empty row 0") {
    val csr = new CsrConverter("user_id", "item_id", Some("rating"),
      allowCollectToMaster = true).transform(doctestDf)
    assert(csr.numRows == 4 && csr.numCols == 12 && csr.nnz == 10)
    val want = Array(
      Array.fill(12)(0.0),
      Array(0, 0, 0, 1, 0, 0, 0, 2, 0, 0, 3, 0).map(_.toDouble),
      Array(0, 0, 0, 0, 0, 3, 0, 0, 2, 0, 0, 1).map(_.toDouble),
      Array(0, 0, 1, 0, 3, 4, 0, 0, 0, 12, 0, 0).map(_.toDouble))
    assert(csr.toDense.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    assert(csr(3, 9) == 12.0 && csr(0, 0) == 0.0)
  }

  test("duplicates summed; None data column means ones") {
    val df = Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L))
      .toDF("user_id", "item_id")
    val csr = new CsrConverter("user_id", "item_id", None,
      allowCollectToMaster = true).transform(df)
    assert(csr.numRows == 2 && csr.numCols == 2)
    assert(csr(0, 1) == 3.0 && csr(1, 0) == 1.0 && csr(0, 0) == 0.0)
  }

  test("explicit shape pads; too-small shape and negatives fail fast") {
    val df = Seq((0L, 1L, 2.0)).toDF("user_id", "item_id", "rating")
    val csr = new CsrConverter("user_id", "item_id", Some("rating"),
      rowCount = Some(5), columnCount = Some(7),
      allowCollectToMaster = true).transform(df)
    assert(csr.numRows == 5 && csr.numCols == 7 && csr.nnz == 1)
    assert(csr.rowPtr.toSeq == Seq(0, 1, 1, 1, 1, 1))
    intercept[IllegalArgumentException] {
      new CsrConverter("user_id", "item_id", Some("rating"),
        columnCount = Some(1), allowCollectToMaster = true).transform(df)
    }
    intercept[IllegalArgumentException] {
      new CsrConverter("user_id", "item_id", Some("rating"),
        allowCollectToMaster = true)
        .transform(Seq((-1L, 0L, 1.0)).toDF("user_id", "item_id", "rating"))
    }
  }

  test("collect guard: refuses without opt-in and over the entry budget") {
    intercept[IllegalArgumentException] {
      new CsrConverter("user_id", "item_id").transform(doctestDf)
    }
    intercept[IllegalArgumentException] {
      new CsrConverter("user_id", "item_id", Some("rating"),
        allowCollectToMaster = true, maxCollectEntries = 3L)
        .transform(doctestDf)
    }
  }

  test("empty input yields a 0x0 matrix") {
    val empty = Seq.empty[(Long, Long, Double)]
      .toDF("user_id", "item_id", "rating")
    val csr = new CsrConverter("user_id", "item_id", Some("rating"),
      allowCollectToMaster = true).transform(empty)
    assert(csr.numRows == 0 && csr.numCols == 0 && csr.nnz == 0)
    assert(csr.rowPtr.toSeq == Seq(0))
  }

  test("distributed form: sorted columns, summed duplicates, row-coverage") {
    val df = Seq(
      (2L, 9L, 1.0), (2L, 3L, 2.0), (2L, 9L, 4.0), (5L, 0L, 1.0),
    ).toDF("user_id", "item_id", "rating")
    val out = new CsrConverter("user_id", "item_id", Some("rating"))
      .transformDistributed(df)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toSeq, r.getSeq[Double](2).toSeq)).sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, Seq(3, 9), Seq(2.0, 5.0)),
      (5L, Seq(0), Seq(1.0))))
  }
}
