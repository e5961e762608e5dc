package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}

/** Sequence packing for LLM training pipelines: concatenate the corpus in a
  * deterministic document order and split the token stream into fixed-size
  * chunks (the standard "concat-and-chunk" batching; a doc spanning a chunk
  * boundary contributes a slice to each side).
  *
  * The only global state is the inclusive token-count prefix sum, computed
  * by [[graft.core.Ops.globalCumsum]] — range-partitioned, so no single
  * task ever holds the corpus order. Everything after the cumsum is
  * per-row integer arithmetic: chunk span, slice offsets, slice lengths —
  * codegen expressions that scale with the scan.
  */
object Packing {

  /** (doc → chunk slices) assignment for chunk size `chunkTokens`.
    *
    * Output columns: the input's, plus
    *  - `chunk_id`   — 0-based chunk the slice lands in
    *  - `slice_begin` — 0-based token offset of the slice within the doc
    *  - `slice_len`  — tokens of this doc inside that chunk
    * A doc with `n` tokens emits ceil over its span: every token of every
    * doc lands in exactly one chunk, chunks are `chunkTokens` long except
    * the last. Integer-only arithmetic → bit-identical across engines. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    val counted = docs.select(F.col(idCol),
      TextStats.tokenCount(F.col(textCol)).as("_n"))
    val cum = graft.core.Ops.globalCumsum(
      counted, "_n", "_cum", F.col(idCol))
    val L = F.lit(chunkTokens.toLong)
    cum
      .withColumn("_start", F.col("_cum") - F.col("_n"))
      .withColumn("chunk_id",
        F.explode(F.sequence(
          F.expr(s"_start div $chunkTokens"),
          F.expr(s"(_cum - 1) div $chunkTokens"))))
      .withColumn("_cbegin", F.greatest(F.col("chunk_id") * L, F.col("_start")))
      .withColumn("_cend", F.least((F.col("chunk_id") + 1) * L, F.col("_cum")))
      .select(F.col(idCol),
        F.col("chunk_id"),
        (F.col("_cbegin") - F.col("_start")).as("slice_begin"),
        (F.col("_cend") - F.col("_cbegin")).as("slice_len"))
  }
}
