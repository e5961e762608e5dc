package graft.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All are pure column expressions — codegen-friendly, no UDFs — so they
  * run at full scan speed over 100 TB document sets.
  */
object TextStats {
  /** Whitespace tokenization (BPE-ish regex splitting available via
    * `pattern`). */
  def tokens(text: Column, pattern: String = "\\s+"): Column =
    F.split(F.trim(text), pattern)

  def tokenCount(text: Column): Column = F.size(tokens(text)).cast("long")

  /** GPT-2-style pre-tokenizer pattern (Radford et al. 2019 — the regex
    * that splits text into word/number/punctuation/contraction chunks
    * BEFORE byte-pair merging; pre-token count upper-bounds BPE token
    * count and tracks it closely on natural text). Two deviations from
    * the original, both for engine portability: no `(?!\S)` lookahead
    * (RE2 — the DuckDB oracle — has no lookahead; single inter-word
    * spaces still attach to the following chunk via the ` ?` prefixes,
    * only multi-space/newline runs surface as whitespace tokens) and no
    * unicode case-insensitive contraction set (the literal lowercase
    * alternatives, as in the original). */
  val PreTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish pre-token chunks, in order. */
  def preTokens(text: Column): Column =
    F.regexp_extract_all(text, F.lit(PreTokenPattern), F.lit(0))

  /** Pre-token count — the "BPE-ish" token budget estimate (whitespace
    * [[tokenCount]] undercounts punctuation-heavy text; this doesn't). */
  def preTokenCount(text: Column): Column =
    F.size(preTokens(text)).cast("long")

  /** Mean token length: total non-space chars / token count. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    F.aggregate(F.transform(ts, t => F.length(t)), F.lit(0),
      (acc, x) => acc + x).cast("double") / F.size(ts)
  }

  /** Share of tokens found in a stopword list — a standard fluency signal
    * (quality heuristic: garbage text has near-zero stopword density). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(F.lower(text))
    F.size(F.filter(ts, t => t.isInCollection(stopwords))).cast("double") / F.size(ts)
  }

  /** Punctuation density: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    F.length(F.regexp_replace(text, "[^.,;:!?'\"()]", "")).cast("double") /
      F.length(text)

  /** Composite quality score in [0,1]: balanced token length, nonzero
    * stopword density, bounded punctuation (the shape of the reference's
    * length/punct/stopword heuristics, expressed as one expression). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenOk = F.when(tokenCount(text).between(5, 100000), 1.0).otherwise(0.3)
    val mtl = meanTokenLength(text)
    val mtlOk = F.when(mtl.between(2.0, 12.0), 1.0).otherwise(0.5)
    val sw = stopwordRatio(text, stopwords)
    val swOk = F.least(sw * 4.0, F.lit(1.0))
    (lenOk * mtlOk * (F.lit(0.5) + swOk * 0.5))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny by design — language ID at scale is a scan-side
    * expression, not a model. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"),
  )

  /** Language ID: argmax of stopword-profile hit counts, deterministic
    * tie-break by language code; "und" (undetermined) when nothing hits. */
  def langId(text: Column, profiles: Map[String, Seq[String]] = LangProfiles): Column = {
    val ts = tokens(F.lower(text))
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      F.struct(F.size(F.filter(ts, t => t.isInCollection(words))).as("score"),
        F.lit(lang).as("lang"))
    }
    val best = F.array_max(F.array(scored: _*))
    F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))
  }

  /** Repeated-token ratio: 1 − |distinct tokens| / |tokens| (case-folded)
    * — the Gopher-style within-document repetition signal; near 0 for
    * natural prose, near 1 for boilerplate/keyword-stuffed spam. */
  def repetitionRatio(text: Column): Column = {
    val ts = tokens(F.lower(text))
    F.lit(1.0) - F.size(F.array_distinct(ts)).cast("double") / F.size(ts)
  }

  /** PII redaction: emails → `<EMAIL>`, 7+-digit runs (phone/account
    * numbers) → `<NUMBER>`. Conservative patterns valid in both Java regex
    * and RE2, so the scrub is oracle-mirrorable and safe for RE2-based
    * engines. A scan-side expression — at 100 TB, scrubbing must ride the
    * ingest scan, not a separate pass. */
  def redactPii(text: Column): Column =
    F.regexp_replace(
      F.regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUMBER>")

  /** Normalized-text fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the canonical key for exact dedup after normalization. */
  def fingerprint(text: Column): Column =
    F.md5(F.lower(F.regexp_replace(F.trim(text), "\\s+", " ")))

  /** Karp–Rabin rolling hash over tokens (base 257, mod 2^31−1) — an
    * order-sensitive content hash usable for shift-invariant chunk
    * fingerprinting. Modulus kept below 2^31 so acc*257+x never overflows
    * a Long under ANSI arithmetic. `tokenHash` defaults to xxhash64
    * (production); pass a portable hash for cross-engine parity. */
  def rollingHash(text: Column,
      tokenHash: Column => Column = t => F.xxhash64(t)): Column = {
    val M = 2147483647L // 2^31 - 1
    F.aggregate(
      tokens(text),
      F.lit(0L),
      (acc, t) => F.pmod(acc * F.lit(257L) + F.pmod(tokenHash(t), F.lit(M)), F.lit(M)))
  }

  /** Rolling hash of EVERY k-token window (the per-position Karp–Rabin
    * chain [[rollingHash]] runs over the whole doc): windowHashes(i) =
    * hash of tokens [i, i+k). Shorter docs yield an empty array. O(n·k)
    * hash-mixes per doc — at k ≈ 8 that is a flat per-token constant, and
    * the whole thing is one codegen'd HOF expression riding the scan (the
    * O(n) prefix-hash trick needs modular inverses the relational oracle
    * can't mirror cheaply; k is small by construction here). */
  def windowHashes(text: Column, k: Int,
      tokenHash: Column => Column = t => F.xxhash64(t)): Column = {
    val M = 2147483647L
    val th = F.transform(tokens(text), t => F.pmod(tokenHash(t), F.lit(M)))
    F.when(F.size(th) >= k,
      F.transform(F.sequence(F.lit(0), F.size(th) - k),
        i => F.aggregate(F.slice(th, i + 1, F.lit(k)), F.lit(0L),
          (acc, x) => F.pmod(acc * F.lit(257L) + x, F.lit(M)))))
      .otherwise(F.expr("CAST(array() AS array<bigint>)"))
  }

  /** The Gopher rules' stop-word presence list (Rae et al. 2021 §A1.1.2):
    * a document must contain at least two distinct words from this set. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule-based quality flags (Rae et al. 2021, "Scaling
    * Language Models" §A1.1.2 — the public MassiveWeb filter): per-rule
    * booleans plus an overall `keep`, as ONE struct-valued expression so
    * the whole filter rides the ingest scan in whole-stage codegen.
    *
    * Rules (all thresholds overridable):
    *  - word count within [minWords, maxWords]
    *  - mean word length within [minMeanWordLen, maxMeanWordLen]
    *  - symbol-to-word ratio (# and ... occurrences) ≤ maxSymbolWordRatio
    *  - fraction of lines starting with a bullet ≤ maxBulletLineFrac
    *  - fraction of lines ending in an ellipsis ≤ maxEllipsisLineFrac
    *  - fraction of words containing an alphabetic char ≥ minAlphaWordFrac
    *  - ≥ minStopwordHits distinct stop words present
    *
    * Every sub-expression is exact integer/string arithmetic (counts and
    * ratios of split arrays), so a SQL engine reproduces each flag
    * bit-for-bit — no float-boundary risk beyond the ratios' IEEE division,
    * which both sides compute identically. */
  def gopherRules(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      stopwords: Seq[String] = GopherStopwords,
      minStopwordHits: Int = 2): Column = {
    val ts = tokens(text)
    val nWords = F.size(ts).cast("long")
    val wordCountOk = nWords.between(minWords, maxWords)
    val mwl = meanTokenLength(text)
    val meanWordLenOk = mwl.between(minMeanWordLen, maxMeanWordLen)
    // '#' chars and ellipsis runs ("..." AND the Unicode '…' U+2026),
    // counted by length difference. Each symbol's word-ratio thresholds
    // SEPARATELY ("greater than 0.1 for either the hash symbol or the
    // ellipsis", Rae et al. §A1.1.2) — a summed form would wrongly reject
    // docs whose individual ratios are each under the threshold.
    val hashCount = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    val ellipsisCount =
      (F.length(text) - F.length(F.regexp_replace(text, "\\.\\.\\.", ""))) / 3 +
        (F.length(text) - F.length(F.regexp_replace(text, "…", "")))
    val symbolOk =
      (hashCount.cast("double") / nWords <= maxSymbolWordRatio) &&
        (ellipsisCount.cast("double") / nWords <= maxSymbolWordRatio)
    val lines = F.split(text, "\n")
    val nLines = F.size(lines)
    val bulletFrac = F.size(F.filter(lines,
      l => F.trim(l).startsWith("- ") || F.trim(l).startsWith("* ") ||
        F.trim(l).startsWith("•"))).cast("double") / nLines
    val bulletOk = bulletFrac <= maxBulletLineFrac
    val ellipsisFrac = F.size(F.filter(lines,
      l => F.rtrim(l).endsWith("...") || F.rtrim(l).endsWith("…")))
      .cast("double") / nLines
    val ellipsisOk = ellipsisFrac <= maxEllipsisLineFrac
    // \p{L}: any Unicode letter — ASCII-only [A-Za-z] would over-filter
    // accented or non-Latin text relative to the paper's "contain at
    // least one alphabetic character"
    val alphaFrac = F.size(F.filter(ts,
      t => t.rlike("\\p{L}"))).cast("double") / nWords
    val alphaOk = alphaFrac >= minAlphaWordFrac
    val stopwordHits =
      F.size(F.filter(F.array_distinct(tokens(F.lower(text))),
        t => t.isInCollection(stopwords)))
    val stopwordOk = stopwordHits >= minStopwordHits
    val keep = wordCountOk && meanWordLenOk && symbolOk && bulletOk &&
      ellipsisOk && alphaOk && stopwordOk
    F.struct(
      nWords.as("n_words"),
      wordCountOk.as("word_count_ok"),
      meanWordLenOk.as("mean_word_len_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      keep.as("keep"))
  }

  /** C4 cleaning rules (Raffel et al. 2020 §2.2 — the "Colossal Clean
    * Crawled Corpus" heuristics, the other canonical rule set next to
    * [[gopherRules]]). Line-level: keep only lines that end in a terminal
    * punctuation mark (. ! ? "), contain at least `minWordsPerLine`
    * words, and do not contain the word "javascript". Page-level: drop
    * pages containing "lorem ipsum", a curly brace "{", or any term from
    * the (pluggable) bad-word list, and pages whose KEPT lines hold fewer
    * than `minSentences` sentences (terminal-punctuation count).
    *
    * Returns a struct: the cleaned text (kept lines re-joined with \n),
    * line/sentence counts, each page flag, and the final keep verdict.
    * Pure string/integer expressions end-to-end — a SQL engine reproduces
    * every field bit-for-bit, cleaned text included. */
  def c4Rules(text: Column,
      minWordsPerLine: Int = 5, minSentences: Int = 3,
      badWords: Seq[String] = Seq("obscene", "offensive")): Column = {
    val lines = F.split(text, "\n")
    def lineWords(l: Column) =
      F.size(F.filter(F.split(F.trim(l), "\\s+"), t => t =!= ""))
    def terminal(l: Column) = {
      val r = F.rtrim(l)
      r.endsWith(".") || r.endsWith("!") || r.endsWith("?") || r.endsWith("\"")
    }
    val keptLines = F.filter(lines, l =>
      terminal(l) && (lineWords(l) >= minWordsPerLine) &&
        !F.lower(l).contains("javascript"))
    val cleaned = F.array_join(keptLines, "\n")
    // sentence count over the KEPT text: runs of terminal punctuation
    // count once ("Hi!?" is one boundary)
    val nSentences = F.size(F.filter(
      F.split(cleaned, "[.!?\"]+"), s => F.trim(s) =!= "")).cast("long")
    val lower = F.lower(text)
    val loremOk = !lower.contains("lorem ipsum")
    val braceOk = !text.contains("{")
    val badWordOk = F.size(F.filter(F.array(badWords.map(F.lit): _*),
      w => lower.contains(w))) === 0
    val sentencesOk = nSentences >= minSentences
    val keep = loremOk && braceOk && badWordOk && sentencesOk
    F.struct(
      cleaned.as("cleaned_text"),
      F.size(lines).cast("long").as("n_lines"),
      F.size(keptLines).cast("long").as("n_lines_kept"),
      nSentences.as("n_sentences"),
      loremOk.as("lorem_ok"),
      braceOk.as("brace_ok"),
      badWordOk.as("bad_word_ok"),
      sentencesOk.as("sentences_ok"),
      keep.as("keep"))
  }

  /** CCNet-style unigram LM quality proxy (Wenzek et al. 2020 filter on
    * KenLM perplexity; the unigram table is the engine-side, fully
    * SQL-mirrorable analogue): doc score = mean over tokens of
    * ln P(token), with P from the corpus' own unigram counts. Very
    * negative → rare-token-heavy docs (garbled bytes, identifier soup);
    * closer to 0 → common fluent vocabulary — threshold or
    * quantile-bucket downstream like a perplexity filter.
    *
    * Scale shape: one explode, one |vocab|-row aggregate re-joined on the
    * token key, one per-doc re-agg; the corpus token total rides along as
    * a lazy 1-row broadcast scalar (no driver action). At 100 TB the only
    * wide exchange is the token-key join, and the frequency side is
    * |vocab| rows, not |tokens|. */
  /** Overlapping token-window document chunking — the RAG/embedding-index
    * preprocessing step (split long documents into `chunkSize`-token
    * windows advancing by `chunkSize − overlap`, so consecutive chunks
    * share `overlap` tokens and no retrieval boundary splits a fact).
    * The final window is the remainder (never empty, never duplicated:
    * a doc emits ⌈max(n − overlap, 1) / step⌉ chunks). Pure expressions —
    * one `sequence` + `slice` per doc, the explode is the only
    * row-multiplying step, and chunk ids are deterministic (doc order).
    * Output: (idCol, chunk_id, chunk_text, n_tokens). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    val ts = tokens(F.col(textCol))
    val n = F.size(ts)
    // starts: 0, step, 2·step, … while start < n − overlap (the last
    // window still gains ≥ 1 new token); single-window docs emit once
    val nChunks = F.greatest(
      F.ceil((n - overlap).cast("double") / step).cast("int"), F.lit(1))
    docs
      .filter(F.trim(F.col(textCol)) =!= "")
      .select(F.col(idCol),
        F.posexplode(F.transform(F.sequence(F.lit(0), nChunks - 1),
          c => F.slice(ts, c * step + 1, F.lit(chunkSize))))
          .as(Seq("chunk_id", "_toks")))
      .select(F.col(idCol), F.col("chunk_id").cast("long").as("chunk_id"),
        F.array_join(F.col("_toks"), " ").as("chunk_text"),
        F.size(F.col("_toks")).cast("long").as("n_tokens"))
  }

  /** Readability & lexical-diversity features — the classic quality
    * column family beside the Gopher/C4 rules: word, sentence (split on
    * [.!?]+ runs; ≥1 so fragments don't divide by zero), and syllable
    * counts (vowel-group runs [aeiouy]+ per lowercased word — the
    * standard approximation), type-token ratio
    * (distinct words / words — lexical diversity), and Flesch reading
    * ease 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Every count is an exact integer and every double op is mirrored in
    * the oracle, so the gate hashes raw values. Pure scan-side
    * expressions. */
  def lexicalStats(text: Column): Column = {
    val ws = tokens(text)
    val nWords = F.size(ws).cast("long")
    val nSentences = F.greatest(
      F.size(F.filter(F.split(text, "[.!?]+"), s => F.trim(s) =!= ""))
        .cast("long"),
      F.lit(1L))
    val nSyllables = F.aggregate(
      F.transform(ws, w =>
        F.size(F.filter(F.split(F.lower(w), "[^aeiouy]+"), s => s =!= ""))
          .cast("long")),
      F.lit(0L), (acc, x) => acc + x)
    val ttr = F.size(F.array_distinct(ws)).cast("double") / nWords
    val flesch = F.lit(206.835) -
      F.lit(1.015) * (nWords.cast("double") / nSentences) -
      F.lit(84.6) * (nSyllables.cast("double") / nWords)
    F.struct(nWords.as("n_words"), nSentences.as("n_sentences"),
      nSyllables.as("n_syllables"), ttr.as("ttr"), flesch.as("flesch"))
  }

  /** Contrastive training triples from a chunked corpus — the standard
    * embedding-model data generator (in-document positives, cross-
    * document negatives): anchor = a chunk, positive = the NEXT chunk of
    * the same document, negative = a seeded-hash-selected chunk from the
    * global chunk table. Triples whose hash-drawn negative lands in the
    * anchor's own document are DROPPED (an ε ≈ chunks_per_doc / n_chunks
    * fraction — a relational contract, no sequential re-draw).
    *
    * Shape at scale: the positive join is a (doc, chunk) equi-self-join;
    * the negative lookup is one equi-join against the globally-numbered
    * chunk table ([[graft.core.Ops.globalRowNumber]] — range-partitioned,
    * no single-task window) with the chunk count broadcast from a
    * one-row frame. Output: (idCol, chunk_id, anchor_text,
    * positive_text, negative_text). */
  def trainingTriples(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkSize: Int = 64, overlap: Int = 0,
      seed: Long = 7): DataFrame = {
    val chunks = chunkDocuments(docs, idCol, textCol, chunkSize, overlap)
      .select(F.col(idCol), F.col("chunk_id"), F.col("chunk_text"))
    val pairs = chunks
      .select(F.col(idCol), F.col("chunk_id"),
        F.col("chunk_text").as("anchor_text"))
      .join(chunks.select(F.col(idCol),
          (F.col("chunk_id") - 1).as("chunk_id"),
          F.col("chunk_text").as("positive_text")),
        Seq(idCol, "chunk_id"))
    val indexed = graft.core.Ops.globalRowNumber(chunks, "_gidx",
      F.col(idCol).asc, F.col("chunk_id").asc)
    val nChunks = indexed.agg(F.max("_gidx").as("_n"))
    val draw = F.pmod(
      graft.core.PortableHash.long(seed, F.col(idCol), F.col("chunk_id")),
      F.col("_n")) + F.lit(1L)
    pairs.crossJoin(F.broadcast(nChunks))
      .withColumn("_gidx", draw).drop("_n")
      .join(indexed.select(F.col("_gidx"),
          F.col(idCol).as("_neg_doc"),
          F.col("chunk_text").as("negative_text")),
        Seq("_gidx"))
      .filter(F.col("_neg_doc") =!= F.col(idCol))
      .select(F.col(idCol), F.col("chunk_id"), F.col("anchor_text"),
        F.col("positive_text"), F.col("negative_text"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    * §3.2: "we split the corpus in three equal parts by perplexity" —
    * training pipelines then keep head+middle, or sample tail-down).
    * Here the LM score is [[unigramLogProb]] (higher = more fluent =
    * LOWER perplexity), thresholds are the exact interpolated quantiles
    * of the score distribution at `fracs`, and buckets are labeled
    * tail (≤ q₁) / middle (≤ q₂) / head. Scores are rounded to 6dp
    * BEFORE the quantile so a second engine reproduces thresholds and
    * boundary assignments from identical doubles (ln is libm-dependent;
    * the threshold compare must not straddle the drift).
    *
    * Output: (idCol, logprob, ppl_bucket). The two quantile scalars are
    * the only driver state. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3)): DataFrame = {
    require(fracs.length == 2 && fracs(0) < fracs(1),
      s"need two increasing fracs, got $fracs")
    val lp = unigramLogProb(docs, idCol, textCol)
      .withColumn("logprob", F.round(F.col("logprob"), 6))
    val r = lp.agg(F.expr(
      s"percentile(logprob, array(${fracs(0)}, ${fracs(1)}))")).first()
    val qs = r.getSeq[Double](0)
    lp.withColumn("ppl_bucket",
      F.when(F.col("logprob") <= qs(0), F.lit("tail"))
        .when(F.col("logprob") <= qs(1), F.lit("middle"))
        .otherwise(F.lit("head")))
  }

  /** Bigram-LM quality score — the order-2 upgrade of
    * [[unigramLogProb]], one step closer to CCNet's KenLM perplexity
    * filter (Wenzek et al. 2020 §3.2): per doc, the mean over positions
    * i ≥ 2 of `ln P(wᵢ | wᵢ₋₁)` under the corpus's own add-k-smoothed
    * bigram model, `P(w|v) = (c(v,w) + k) / (c(v) + k·V)` with V the
    * unigram vocabulary size. Near 0 → fluent under the corpus
    * distribution; strongly negative → rare transitions (noise, boilerplate
    * soup, wrong language). Docs with < 2 tokens score 0.0.
    *
    * The per-doc mean folds its position-ORDERED term list (not a plain
    * avg): float sums are order-sensitive, and the deterministic fold is
    * what lets a second engine reproduce the value bit-for-bit.
    *
    * Scale shape: one bigram explode, one |bigram-vocab|-row and one
    * |vocab|-row aggregate re-joined on their keys, V rides along as a
    * lazy 1-row broadcast scalar; the only corpus-wide exchanges are the
    * two count joins. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val ts = tokens(F.lower(F.col(textCol)))
    val bigrams = F.when(F.size(ts) >= 2,
      F.transform(F.sequence(F.lit(1), F.size(ts) - 1),
        i => F.struct(i.as("_pos"),
          F.element_at(ts, i).as("_prev"), F.element_at(ts, i + 1).as("_cur"))))
      .otherwise(F.array())
    val big = docs.select(F.col(idCol), F.explode(bigrams).as("_b"))
      .select(F.col(idCol), F.col("_b._pos").as("_pos"),
        F.col("_b._prev").as("_prev"), F.col("_b._cur").as("_cur"))
    val uni = docs.select(F.explode(ts).as("_tok"))
      .groupBy("_tok").agg(F.count(F.lit(1)).as("_uc"))
    val bc = big.groupBy("_prev", "_cur").agg(F.count(F.lit(1)).as("_bc"))
    val vocab = F.broadcast(uni.agg(F.count(F.lit(1)).cast("double").as("_v")))
    val terms = big
      .join(bc, Seq("_prev", "_cur"))
      .join(uni.select(F.col("_tok").as("_prev"), F.col("_uc")), Seq("_prev"))
      .crossJoin(vocab)
      .select(F.col(idCol), F.col("_pos"),
        F.log((F.col("_bc").cast("double") + k) /
          (F.col("_uc").cast("double") + F.col("_v") * k)).as("_term"))
    val scored = terms.groupBy(idCol)
      .agg((F.aggregate(
        F.transform(
          F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_term")))),
          s => s.getField("_term")),
        F.lit(0.0), (acc, x) => acc + x) / F.count(F.lit(1)))
        .as("logprob"))
    docs.select(F.col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("logprob", F.coalesce(F.col("logprob"), F.lit(0.0)))
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(F.col(idCol),
      F.explode(tokens(F.lower(F.col(textCol)))).as("_tok"))
    val freqs = toks.groupBy("_tok").agg(F.count(F.lit(1)).as("_cnt"))
    val scored = toks.join(freqs, Seq("_tok"))
      .crossJoin(F.broadcast(freqs.agg(F.sum("_cnt").as("_n"))))
      .groupBy(idCol)
      .agg(F.avg(F.log(F.col("_cnt").cast("double") / F.col("_n"))).as("logprob"))
    // null-text docs produce no tokens → keep them at 0.0 (the reference
    // perplexity filters treat empty docs as a separate length filter's job)
    docs.select(F.col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("logprob", F.coalesce(F.col("logprob"), F.lit(0.0)))
  }

  /** Per-source corpus audit report — the one-pass health summary a
    * pipeline emits before/after a cleaning stage: volume (docs, tokens,
    * chars, mean doc length), exact-dup pressure (docs sharing a
    * normalized [[fingerprint]]), PII incidence ([[redactPii]] changed
    * the text), quality pass rate ([[qualityScore]] ≥ `qualityFloor`,
    * compared on the 6dp-rounded score so both engines threshold the
    * same double), and the language mix (distinct langs + the modal
    * language, ties broken by code).
    *
    * Shape at scale: ONE groupBy(source) over per-doc expressions —
    * every stat is a count/sum with O(1) agg state (the fingerprint
    * distinct is Spark's partial-aggregated count_distinct) — plus a
    * (source, lang)-sized argmax for the modal language. No windows over
    * doc-sized partitions, no collects. */
  def corpusReport(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      langCol: String = "lang",
      stopwords: Seq[String] = LangProfiles("en"),
      qualityFloor: Double = 0.5): DataFrame = {
    val t = F.col(textCol)
    val perDoc = docs.select(
      F.col(srcCol).as("source"), F.col(langCol).as("_lang"),
      tokenCount(t).as("_nt"),
      F.length(t).cast("long").as("_nc"),
      fingerprint(t).as("_fp"),
      (redactPii(t) =!= t).cast("long").as("_pii"),
      (F.round(qualityScore(t, stopwords), 6) >= qualityFloor)
        .cast("long").as("_q"))
    val agg = perDoc.groupBy("source").agg(
      F.count(F.lit(1)).as("n_docs"),
      F.sum("_nt").as("total_tokens"),
      F.sum("_nc").as("total_chars"),
      (F.count(F.lit(1)) - F.countDistinct(F.col("_fp"))).as("n_dup_docs"),
      F.sum("_pii").as("n_pii_docs"),
      F.sum("_q").as("n_quality_docs"),
      F.countDistinct(F.col("_lang")).as("n_langs"))
      .withColumn("mean_tokens",
        F.col("total_tokens").cast("double") / F.col("n_docs"))
    val langCounts = docs
      .groupBy(F.col(srcCol).as("source"), F.col(langCol).as("_lang"))
      .agg(F.count(F.lit(1)).as("_lc"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(F.col("_lc").desc, F.col("_lang").asc)
    val topLang = langCounts
      .withColumn("_rn", F.row_number().over(w))
      .filter(F.col("_rn") === 1)
      .select(F.col("source"), F.col("_lang").as("top_lang"))
    agg.join(topLang, Seq("source"))
  }
}
