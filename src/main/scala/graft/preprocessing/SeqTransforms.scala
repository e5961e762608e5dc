package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Next-item training-case generator for sequential models (reference:
  * replay/experimental/preprocessing/sequence_generator.py:13-206).
  *
  * For each interaction row, emits the window of up to `lenWindow`
  * PRECEDING values per transform column (the model input) plus the row's
  * own value as the label (the prediction target); rows with an empty
  * window — each group's first — are dropped. One window spec shared by
  * every column, one shuffle on the group key; the expansion is
  * rows-not-arrays until the caller explodes, so it scales with the log.
  *
  * `orderBy` must be a total order within a group for deterministic
  * output (the reference orders by the raw column and inherits pandas/
  * Spark tie order; we require the caller to pass tie-breakers). */
object SequenceGenerator {
  def transform(
      df: DataFrame,
      groupBy: Seq[String],
      orderBy: Seq[String],
      transformColumns: Seq[String],
      lenWindow: Int = 50,
      sequencePrefix: String = "",
      sequenceSuffix: String = "_list",
      labelPrefix: String = "label_",
      labelSuffix: String = "",
      getListLen: Boolean = false,
      listLenColumn: String = "list_len",
  ): DataFrame = {
    require(lenWindow > 0, s"lenWindow must be positive, got $lenWindow")
    require(groupBy.nonEmpty && transformColumns.nonEmpty,
      "groupBy and transformColumns must be non-empty")
    val w = Window.partitionBy(groupBy.map(F.col): _*)
      .orderBy(orderBy.map(F.col): _*)
      .rowsBetween(-lenWindow, -1)
    var out = df
    transformColumns.foreach { c =>
      out = out
        .withColumn(sequencePrefix + c + sequenceSuffix,
          F.collect_list(c).over(w))
        .withColumn(labelPrefix + c + labelSuffix, F.col(c))
    }
    val first = sequencePrefix + transformColumns.head + sequenceSuffix
    out = out.filter(F.size(F.col(first)) > 0)
    val seqCols = transformColumns.map(c => sequencePrefix + c + sequenceSuffix)
    val labelCols = transformColumns.map(c => labelPrefix + c + labelSuffix)
    val select = groupBy ++ seqCols ++ labelCols ++
      (if (getListLen) Seq(listLenColumn) else Seq.empty)
    if (getListLen)
      out = out.withColumn(listLenColumn, F.size(F.col(first)))
    out.select(select.map(F.col): _*)
  }
}

/** Array-column padder (reference:
  * replay/experimental/preprocessing/padder.py:14-236).
  *
  * Pads each named array column to `arraySize` with `paddingValue` on
  * `paddingSide`; arrays longer than the target are cut when `cutArray`
  * ("right" keeps the LAST `arraySize` elements — the reference's slice
  * from −min(len, size) — "left" keeps the first). `arraySize = None`
  * resolves to the column's max length (one scalar agg per column — a
  * driver-side scalar, not a data collect). Null arrays are treated as
  * empty, as the reference's coalesce does. */
object ArrayPadder {
  def transform(
      df: DataFrame,
      padColumns: Seq[String],
      paddingSide: String = "right",
      paddingValue: Any = 0,
      arraySize: Option[Int] = None,
      cutArray: Boolean = true,
      cutSide: String = "right",
  ): DataFrame = {
    require(Set("right", "left").contains(paddingSide),
      s"paddingSide must be right | left, got $paddingSide")
    require(Set("right", "left").contains(cutSide),
      s"cutSide must be right | left, got $cutSide")
    arraySize.foreach(n => require(n >= 1, s"arraySize must be >= 1, got $n"))
    var out = df
    padColumns.foreach { c =>
      require(out.schema(c).dataType.typeName == "array",
        s"column $c must be an array to be padded")
      val target: Int = arraySize.getOrElse {
        val m = out.agg(F.max(F.size(F.col(c)))).first()
        if (m.isNullAt(0)) 0 else m.getInt(0)
      }
      val base = F.coalesce(F.col(c), F.array())
      val cut: Column =
        if (!cutArray) base
        else if (cutSide == "right")
          // keep the last min(len, target) elements
          F.when(F.size(base) > 0, F.slice(base,
            F.lit(-1) * F.least(F.size(base), F.lit(target)), F.lit(target)))
            .otherwise(F.array())
        else
          F.when(F.size(base) > 0,
            F.slice(base, F.lit(1), F.least(F.size(base), F.lit(target))))
            .otherwise(F.array())
      val cutCast = paddingValue match {
        case _: String => F.transform(cut, x => x.cast("string"))
        case _         => cut
      }
      // sequence(1, 0) would step DOWN and yield two elements — guard the
      // empty-pad case with an empty array of the padding value's type
      val padLen = F.greatest(F.lit(target) - F.size(cutCast), F.lit(0))
      val padsSafe = F.when(padLen > 0,
          F.transform(F.sequence(F.lit(1), padLen), _ => F.lit(paddingValue)))
        .otherwise(F.slice(F.array(F.lit(paddingValue)), 1, 0))
      out = out.withColumn(c,
        if (paddingSide == "right") F.concat(cutCast, padsSafe)
        else F.concat(padsSafe, cutCast))
    }
    out
  }
}
