package graft.preprocessing

import org.apache.spark.sql.{DataFrame, functions => F}

/** Driver-side CSR matrix: standard three-array form.
  * `values(rowPtr(i) until rowPtr(i+1))` are row i's entries at columns
  * `colIdx(rowPtr(i) until rowPtr(i+1))` (column-sorted within a row). */
final case class CsrMatrix(
    numRows: Int,
    numCols: Int,
    rowPtr: Array[Int],
    colIdx: Array[Int],
    values: Array[Double],
) {
  def nnz: Int = values.length

  /** Dense lookup (test/debug helper — O(log nnz-per-row)). */
  def apply(i: Int, j: Int): Double = {
    require(i >= 0 && i < numRows && j >= 0 && j < numCols,
      s"($i,$j) out of ${numRows}x$numCols")
    var lo = rowPtr(i); var hi = rowPtr(i + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (colIdx(mid) == j) return values(mid)
      else if (colIdx(mid) < j) lo = mid + 1
      else hi = mid - 1
    }
    0.0
  }

  def toDense: Array[Array[Double]] = {
    val m = Array.fill(numRows)(new Array[Double](numCols))
    var i = 0
    while (i < numRows) {
      var p = rowPtr(i)
      while (p < rowPtr(i + 1)) { m(i)(colIdx(p)) = values(p); p += 1 }
      i += 1
    }
    m
  }
}

/** Public CSR conversion (reference: replay/preprocessing/converter.py:
  * 10-108 `CSRConverter`) — lifts the dense re-index that previously lived
  * inside SLIM's driver-CSC path (models/SLIM.scala:149-165) into a
  * documented, bounded helper.
  *
  * Semantics mirror scipy's `csr_matrix((data, (rows, cols)))` as the
  * reference uses it: duplicate (row, col) entries are SUMMED, the shape
  * defaults to `max(dim) + 1` per axis (0 on an empty input), an explicit
  * `rowCount`/`columnCount` must cover the data, and a missing
  * `dataColumn` means all-ones. Negative indices are rejected (scipy's
  * wraparound is a footgun, not a feature anyone relies on).
  *
  * Spark shape: the per-row aggregation ([[transformDistributed]]) is the
  * scale path — one shuffle on (row, col) to sum duplicates, one on row to
  * assemble sorted (col, value) arrays; rows never meet the driver. The
  * reference's scipy hand-off ([[transform]]) is an explicitly OPT-IN
  * driver collect (`allowCollectToMaster`, converter.py:69-71) with an
  * entry-count guard — the reference merely warns before collecting the
  * full frame; we fail fast instead. */
final class CsrConverter(
    val firstDimColumn: String = "query_id",
    val secondDimColumn: String = "item_id",
    val dataColumn: Option[String] = None,
    val rowCount: Option[Int] = None,
    val columnCount: Option[Int] = None,
    val allowCollectToMaster: Boolean = false,
    val maxCollectEntries: Long = 10000000L,
) extends Serializable {

  /** Distributed per-row CSR assembly: `(row, col_idx array<int>,
    * values array<double>)`, columns sorted within each row, duplicates
    * summed. Rows with no entries are absent (CSR's empty-row convention
    * lives in [[transform]]'s rowPtr). */
  def transformDistributed(df: DataFrame): DataFrame = {
    val data = dataColumn match {
      case Some(c) => F.col(c).cast("double")
      case None    => F.lit(1.0)
    }
    df.select(
        F.col(firstDimColumn).cast("long").as("_row"),
        F.col(secondDimColumn).cast("long").as("_col"),
        data.as("_v"))
      .groupBy("_row", "_col").agg(F.sum("_v").as("_v"))
      .groupBy("_row")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("_col"), F.col("_v"))))
        .as("_e"))
      .select(F.col("_row").as("row"),
        F.transform(F.col("_e"), e => e.getField("_col").cast("int"))
          .as("col_idx"),
        F.transform(F.col("_e"), e => e.getField("_v")).as("values"))
  }

  /** Driver-side CSR (the reference's scipy return). Requires
    * `allowCollectToMaster` (converter.py:69-71) and at most
    * `maxCollectEntries` post-dedup entries — fail fast, never OOM. */
  def transform(df: DataFrame): CsrMatrix = {
    require(allowCollectToMaster,
      "CsrConverter.transform collects the matrix to the driver; pass " +
        "allowCollectToMaster=true explicitly (converter.py:69-71) or use " +
        "transformDistributed")
    val perRow = transformDistributed(df)
      .withColumn("_nnz", F.size(F.col("col_idx")))
    val stats = perRow.agg(
      F.coalesce(F.sum("_nnz"), F.lit(0L)).as("nnz"),
      F.max("row").as("maxRow"),
      F.coalesce(F.max(F.element_at(F.col("col_idx"), -1)), F.lit(-1))
        .as("maxCol"),
      F.coalesce(F.min(F.col("row")), F.lit(0L)).as("minRow"),
      F.coalesce(F.min(F.element_at(F.col("col_idx"), 1)), F.lit(0))
        .as("minCol")).first()
    val nnzTotal = stats.getLong(0)
    require(nnzTotal <= maxCollectEntries,
      s"refusing to collect $nnzTotal entries to the driver (limit " +
        s"$maxCollectEntries); use transformDistributed")
    require(stats.getLong(3) >= 0L && stats.getInt(4) >= 0,
      s"negative indices: min row ${stats.getLong(3)}, min col ${stats.getInt(4)}")
    val maxRow = if (stats.isNullAt(1)) -1L else stats.getLong(1)
    val maxCol = stats.getInt(2).toLong
    val nRows = rowCount.map(_.toLong).getOrElse(maxRow + 1L)
    val nCols = columnCount.map(_.toLong).getOrElse(maxCol + 1L)
    require(nRows > maxRow && nCols > maxCol,
      s"shape ($nRows, $nCols) too small for max index ($maxRow, $maxCol)")
    require(nRows <= Int.MaxValue && nCols <= Int.MaxValue,
      s"driver CSR bounded to Int dimensions; got ($nRows, $nCols)")

    val rows = perRow.orderBy("row").collect()
    val rowPtr = new Array[Int](nRows.toInt + 1)
    val colIdx = new Array[Int](nnzTotal.toInt)
    val values = new Array[Double](nnzTotal.toInt)
    var p = 0; var prev = 0
    rows.foreach { r =>
      val row = r.getLong(0).toInt
      var i = prev + 1
      while (i <= row) { rowPtr(i) = p; i += 1 } // empty rows inherit p
      prev = row
      val cs = r.getSeq[Int](1); val vs = r.getSeq[Double](2)
      var j = 0
      while (j < cs.length) { colIdx(p) = cs(j); values(p) = vs(j); p += 1; j += 1 }
      rowPtr(row + 1) = p
    }
    var i = prev + 2
    while (i <= nRows.toInt) { rowPtr(i) = p; i += 1 }
    CsrMatrix(nRows.toInt, nCols.toInt, rowPtr, colIdx, values)
  }
}
