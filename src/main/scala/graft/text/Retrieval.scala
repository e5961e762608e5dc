package graft.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.core.Ops

/** Sparse lexical retrieval (Okapi BM25 over an inverted postings table)
  * and hybrid-list fusion (reciprocal-rank fusion, Cormack et al. 2009) —
  * the retrieval-side complement of the dense ANN family
  * ([[Similarity]] / [[graft.models.AnnIndex]]): a RAG or
  * dedup-candidate pipeline typically runs BOTH a lexical and an
  * embedding retriever and fuses the lists.
  *
  * Everything is relational and engine-portable:
  *  - postings: explode(tokens) → groupBy(doc, term) — ONE shuffle; the
  *    document-frequency table is a second groupBy over the postings
  *    (map-side combinable, ≤ |vocab| cells per partition);
  *  - corpus stats (N, avgdl) are a one-row frame cross-joined broadcast
  *    — no driver collect;
  *  - scoring: query terms equi-join the postings on `term` (the classic
  *    sparse-retrieval shape — no all-pairs step; fan-out per query =
  *    Σ_t df(t), capped by `maxDfFrac` which drops stopword-degree
  *    terms from the match set exactly like a search engine's stopword
  *    list), then ONE groupBy(query, doc) with a SORTED-term left fold
  *    (cross-engine float-sum order — the DSIR/mixture-gate lesson);
  *  - crop: the O(k)-state bounded heap ([[Ops.getTopKRecsBounded]]),
  *    never a full per-query sort; ranks are re-derived on the ≤k-row
  *    residual.
  *
  * At 100 TB: postings ≈ corpus token count (one shuffle), df/stats are
  * vocabulary-sized aggregations, and per-query cost is independent of
  * corpus size once high-df terms are capped — the standard inverted-
  * index scaling argument. Scores round to 6dp (ln is libm-dependent
  * across engines).
  */
object Retrieval {

  /** Lowercased whitespace tokens; empty cells dropped. */
  private def toks(text: Column): Column =
    F.filter(F.split(F.lower(F.trim(text)), "\\s+"), t => t =!= "")

  /** Inverted postings: one row per (doc, term) with the term frequency
    * and the document's token length — `(idCol, term, tf, dl)`, tf/dl
    * BIGINT. Zero-token documents carry no postings (but still count in
    * [[corpusStats]]'s N and avgdl). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tokens = docs.select(F.col(idCol), toks(F.col(textCol)).as("_ts"))
      .select(F.col(idCol), F.size(F.col("_ts")).cast("long").as("dl"),
        F.explode(F.col("_ts")).as("term"))
    tokens.groupBy(F.col(idCol), F.col("term"), F.col("dl"))
      .agg(F.count(F.lit(1)).as("tf"))
      .select(F.col(idCol), F.col("term"), F.col("tf"), F.col("dl"))
  }

  /** One-row (n_docs, avgdl) frame — cross-joined (broadcast) into the
    * scorer, so corpus statistics never touch the driver. */
  def corpusStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(F.size(toks(F.col(textCol))).cast("long").as("_dl"))
      .agg(F.count(F.lit(1)).as("n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).as("avgdl"))

  /** Okapi BM25 top-k: for each query row `(queryIdCol, textCol)` score
    * every corpus document sharing ≥1 term and keep the k best —
    * `(query_id, doc_id, score, rank)`, score rounded 6dp, rank BIGINT
    * 1..k by (score desc, doc_id asc).
    *
    * score(q,d) = Σ_{t ∈ distinct(q) ∩ d} idf(t) ·
    *              tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (Lucene's +1 form —
    * never negative, so high-df terms dilute rather than invert).
    * Query-side term multiplicity is ignored (standard for short
    * queries); the fold over matched terms is term-sorted on both
    * engines.
    *
    * `maxDfFrac` < 1 drops terms with df > maxDfFrac·N from the match
    * set — the scale guard: a term appearing in half the corpus would
    * fan every query containing it across half the corpus for near-zero
    * idf contribution. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", maxDfFrac: Double = 1.0): DataFrame = {
    val post = postings(docs, idCol, textCol)
    val stats = corpusStats(docs, textCol)
    val df = post.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    // idf per term, mirroring the oracle's op order exactly:
    // ((n - df) double + 0.5) / (df double + 0.5) + 1, then ln.
    val idf = df.crossJoin(F.broadcast(stats))
      .filter(F.col("df") <= F.col("n_docs").cast("double") * maxDfFrac)
      .select(F.col("term"),
        F.log(((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) /
          (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0)).as("idf"),
        F.col("avgdl"))
    val qTerms = queries
      .select(F.col(queryIdCol), F.explode(toks(F.col(textCol))).as("term"))
      .distinct()
    val matched = qTerms.join(idf, Seq("term"))
      .join(post.withColumnRenamed(idCol, "doc_id"), Seq("term"))
    val term = F.col("idf") *
      ((F.col("tf").cast("double") * (F.lit(k1) + F.lit(1.0))) /
        (F.col("tf").cast("double") +
          F.lit(k1) * (F.lit(1.0) - F.lit(b) +
            F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl")))))
    // Order-free cross-engine sum: each term contribution quantizes to
    // 1e-9 units (HALF_UP — contributions are strictly positive, so
    // DuckDB's away-from-zero agrees) and the per-(query,doc) score is an
    // exact BIGINT sum — commutative, so no collect_list buffer, no sort,
    // and the aggregation stays in codegen with O(1) state. Bound: ≤ ~20
    // per contribution → 2e10 units × |query terms| ≪ Long.MaxValue.
    // The 6dp rounding of the de-quantized sum carries ≤ 0.5e-9·|terms|
    // quantization noise — below the ln libm drift the rounding already
    // absorbs.
    val scored = matched
      .select(F.col(queryIdCol), F.col("doc_id"),
        F.round(term * F.lit(1e9), 0).cast("long").as("_ci"))
      .groupBy(F.col(queryIdCol), F.col("doc_id"))
      .agg(F.round(F.sum("_ci").cast("double") / F.lit(1e9), 6).as("score"))
    val cropped = Ops.getTopKRecsBounded(scored, k,
      queryCol = queryIdCol, itemCol = "doc_id", ratingCol = "score")
    val w = Window.partitionBy(queryIdCol)
      .orderBy(F.col("score").desc, F.col("doc_id").asc)
    cropped.withColumn("rank", F.row_number().over(w).cast("long"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse ranked lists
    * `(query_id, doc_id, rank)` into
    * `(query_id, doc_id, rrf_score, rank)` with
    * rrf = Σ_lists 1/(kRrf + rank_list), absent-from-list terms = 0.
    * The sum folds in LIST order (a fixed two-to-few-term chain — no
    * float-order hazard) and each term is an exact-integer division, so
    * the score is bit-portable with no rounding. Output rank 1..k by
    * (rrf desc, doc_id asc), cropped via the bounded heap. Scale: one
    * full-outer equi-join per extra list on (query, doc) — list-sized
    * (≤ queries×k_list rows), never corpus-sized. */
  /** Per-document keyword extraction on the EXACT tf/df rational: each
    * document's terms scored `tf·10⁶ div df` (high term frequency, low
    * corpus frequency — the TF-IDF idea without the libm log, so every
    * score is engine-exact) and cropped to the top `k` by
    * (score desc, term asc). Terms shorter than `minLen` are dropped
    * (articles/punctuation fragments). Built on [[postings]] (ONE
    * explode+groupBy shuffle) + a |vocab|-sized df aggregation joined
    * back on the term; the rank window partitions BY DOCUMENT (frame =
    * one doc's vocabulary, never the corpus). Output:
    * (idCol, term, tf, df, score_ppm, rank). */
  def keywords(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text", minLen: Int = 4): DataFrame = {
    require(k >= 1, s"keywords: need k >= 1, got $k")
    val post = postings(docs, idCol, textCol)
      .filter(F.length(F.col("term")) >= minLen)
    val df = post.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val w = Window.partitionBy(F.col(idCol))
      .orderBy(F.col("score_ppm").desc, F.col("term").asc)
    post.join(df, Seq("term"))
      .withColumn("score_ppm", F.expr("(tf * 1000000) div df"))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select(F.col(idCol), F.col("term"), F.col("tf"), F.col("df"),
        F.col("score_ppm"), F.col("rank"))
  }

  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60,
      queryIdCol: String = "query_id", docIdCol: String = "doc_id"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    val keyed = lists.zipWithIndex.map { case (l, i) =>
      l.select(F.col(queryIdCol), F.col(docIdCol),
        (F.lit(1.0) / (F.lit(kRrf).cast("double") + F.col("rank").cast("double")))
          .as(s"_r$i"))
    }
    val joined = keyed.reduce((a, b) =>
      a.join(b, Seq(queryIdCol, docIdCol), "full_outer"))
    val score = lists.indices
      .map(i => F.coalesce(F.col(s"_r$i"), F.lit(0.0)))
      .reduce(_ + _)
    val scored = joined.select(F.col(queryIdCol), F.col(docIdCol),
      score.as("rrf_score"))
    val cropped = Ops.getTopKRecsBounded(scored, k,
      queryCol = queryIdCol, itemCol = docIdCol, ratingCol = "rrf_score")
    val w = Window.partitionBy(queryIdCol)
      .orderBy(F.col("rrf_score").desc, F.col(docIdCol).asc)
    cropped.withColumn("rank", F.row_number().over(w).cast("long"))
  }
}
