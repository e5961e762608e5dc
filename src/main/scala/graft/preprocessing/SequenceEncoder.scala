package graft.preprocessing

import org.apache.spark.sql.{DataFrame, functions => F}

/** Array-column label encoding (reference: label_encoder.py:568-792
  * SequenceEncodingRule): encode every element of an array column through
  * a fitted LabelEncoder mapping.
  *
  * Instead of the reference's explode → join → re-collect (which loses
  * order and costs two shuffles), elements are mapped through a broadcast
  * map expression built from the mapping table — order-preserving,
  * shuffle-free, and codegen-friendly. For mappings too large to
  * broadcast, `transformViaJoin` keeps the relational path (posexplode →
  * join → re-collect by position). */
object SequenceEncoder {
  /** Order-preserving encode of `arrayCol` using `encoder`'s mapping.
    * Unknown elements become null (use array_compact after, or validate
    * first). Mapping is collected + broadcast: bounded by label
    * cardinality, same bound as any broadcast dim. */
  def transform(encoder: LabelEncoder, df: DataFrame, arrayCol: String): DataFrame = {
    val entries = encoder.mapping
    val mapExpr = F.map_from_entries(F.collect_list(F.struct(
      F.col("label"), F.col("code"))))
    val m = entries.agg(mapExpr.as("m"))
    df.crossJoin(F.broadcast(m))
      .withColumn(arrayCol, F.transform(F.col(arrayCol), x => F.element_at(F.col("m"), x)))
      .drop("m")
  }

  /** Relational path for very large mappings: posexplode → join →
    * re-collect ordered by position (label_encoder.py's own shape).
    * Rows with empty/null arrays survive (posexplode emits nothing for
    * them, so the re-join must be left + coalesce to an empty array). */
  def transformViaJoin(encoder: LabelEncoder, df: DataFrame, arrayCol: String,
      idCols: Seq[String]): DataFrame = {
    val exploded = df.select(
      idCols.map(F.col) :+ F.posexplode(F.col(arrayCol)): _*)
      .toDF(idCols :+ "_pos" :+ "label": _*)
    val joined = exploded.join(encoder.mapping, Seq("label"), "left")
    val regrouped = joined.groupBy(idCols.map(F.col): _*)
      .agg(F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("_pos"), F.col("code")))),
        s => s.getField("code")).as(arrayCol))
    df.drop(arrayCol).join(regrouped, idCols, "left")
      .withColumn(arrayCol,
        F.coalesce(F.col(arrayCol), F.array().cast("array<bigint>")))
  }
}

/** Padded-sequence tokenizer — the training-tensor exporter of the
  * reference's NN data family (replay/data/nn/sequence_tokenizer.py:189-246
  * groups per-query time-sorted sequences; truncation and padding semantics
  * from torch_sequential_dataset.py:91-137: truncation keeps the MOST
  * RECENT maxLen events, padding is on the LEFT — `padded[-len:] = seq` —
  * so the sequence always ends at the array's end, where a
  * next-item-prediction model reads it).
  *
  * Scale shape: a rank-window crop (lowered to WindowGroupLimit — bounded
  * per-group state, no full-partition sort survives the limit pushdown)
  * drops everything but each query's last maxLen events BEFORE any array
  * is built, so aggregation state is O(maxLen) per query, not O(history) —
  * a 10⁶-event user costs the same as a 10-event one past the crop. The
  * groupBy reuses the window's hash partitioning on the query key, so the
  * whole operator is one shuffle. */
object SequenceTokenizer {
  import org.apache.spark.sql.expressions.Window

  /** (query, items array[maxLen] left-padded with `padValue`, length =
    * un-padded element count). Order inside the array is (ts asc, item
    * asc) — the tie-break makes output layout-independent. */
  def pad(
      log: DataFrame,
      maxLen: Int,
      padValue: Long = 0L,
      queryCol: String = "query_id",
      itemCol: String = "item_id",
      tsCol: String = "timestamp",
  ): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // keep the most recent maxLen events: (ts desc, item desc) rank is the
    // exact reverse of the rebuild order below, so the kept multiset is
    // the ascending list's last maxLen elements
    val w = Window.partitionBy(queryCol)
      .orderBy(F.col(tsCol).desc, F.col(itemCol).desc)
    val recent = log
      .select(F.col(queryCol), F.col(itemCol).cast("long").as(itemCol), F.col(tsCol))
      .withColumn("_rn", F.row_number().over(w))
      .filter(F.col("_rn") <= maxLen)
    val seqs = recent.groupBy(queryCol).agg(
      F.transform(
        F.sort_array(F.collect_list(F.struct(F.col(tsCol).as("t"),
          F.col(itemCol).as("i")))),
        s => s.getField("i")).as("_t"))
    seqs.select(F.col(queryCol),
      F.concat(
        F.array_repeat(F.lit(padValue), F.lit(maxLen) - F.size(F.col("_t"))),
        F.col("_t")).as("items"),
      F.size(F.col("_t")).cast("long").as("length"))
  }
}

/** Union N interaction frames with a duplicate policy
  * (reference: replay/preprocessing/utils.py:100-180 merge_subsets). */
object MergeSubsets {
  sealed trait DuplicatePolicy
  case object ErrorOnDuplicates  extends DuplicatePolicy
  case object DropDuplicates     extends DuplicatePolicy
  case object IgnoreDuplicates   extends DuplicatePolicy

  def merge(frames: Seq[DataFrame], policy: DuplicatePolicy,
      keyCols: Seq[String]): DataFrame = {
    require(frames.nonEmpty, "no frames to merge")
    val unioned = frames.reduce(_.unionByName(_))
    policy match {
      case IgnoreDuplicates => unioned
      case DropDuplicates   => unioned.dropDuplicates(keyCols)
      case ErrorOnDuplicates =>
        val dups = unioned.groupBy(keyCols.map(F.col): _*)
          .count().filter(F.col("count") > 1).count()
        if (dups > 0)
          throw new IllegalArgumentException(s"$dups duplicate keys in merged frames")
        unioned
    }
  }
}
