package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * shuffle); they scale linearly with the scan and push column pruning
  * down to parquet.
  */
object TextAnalysis {

  /** Whitespace tokenization of a text column → array<string>. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: word pieces, numbers, punctuation runs —
    * the standard pre-tokenizer split used by GPT-2-style BPE. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Corpus text normalization — the standard pre-tokenization hygiene
    * pass (every public pipeline — C4, CCNet, Dolma — runs a variant):
    * Unicode NFC canonical composition (decomposed accent sequences →
    * composed forms, so "e"+U+0301 and "é" dedup/tokenize identically),
    * control characters replaced by spaces, whitespace runs collapsed
    * to single spaces, ends trimmed. Pure row-local column expression
    * (codegen'd NFC kernel + two regexes), no shuffle; engine-portable,
    * so the whole pass is full-oracle verifiable (q148). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(Functional.nfcNormalize(text),
        "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))

  // ---- language ID ----------------------------------------------------

  /** Tiny per-language stopword profiles (public-knowledge function
    * words). Deterministic n-gram-free heuristic: language with the
    * highest stopword-hit ratio wins; "und" (undetermined) when no
    * profile scores. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it",
      "for", "on", "with", "as", "are", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "eine", "zu", "den", "von", "für", "auf", "im"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "du",
      "pour", "dans", "que", "qui", "pas", "sur"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de",
      "que", "en", "por", "para", "no", "con"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他", "有", "这", "个",
      "们", "中", "来", "上", "大"))

  /** Detected language code, by argmax of stopword hits — fused
    * single-scan kernel over the raw bytes (no lower() pass, no token
    * array; profiles mirrored in Kernels). */
  def langId(text: Column): Column = Functional.langIdText(text)

  // ---- quality scoring ------------------------------------------------

  /** Document-quality features: lengths, mean token length, alpha /
    * punctuation / stopword ratios. Returns a struct column. */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = greatest(size(toks), lit(1))
    struct(
      nChars.as("n_chars"),
      size(toks).as("n_tokens"),
      (length(regexp_replace(text, "\\s+", "")).cast(DoubleType) /
        nToks.cast(DoubleType)).as("mean_token_len"),
      Functional.asciiAlphaRatio(text).as("alpha_ratio"),
      (length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast(DoubleType) /
        greatest(nChars, lit(1)).cast(DoubleType)).as("punct_ratio"),
      Functional.stopwordRatioEn(text).as("stopword_ratio"))
  }

  /** Scalar quality score in [0,1]: soft-window each feature to its
    * "good document" band (C4/Gopher-style heuristics). */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenOk = when(f.getField("n_tokens").between(10, 100000), 1.0)
      .otherwise(0.0)
    val tokLenOk = when(f.getField("mean_token_len").between(2.0, 12.0), 1.0)
      .otherwise(0.0)
    val alphaOk = f.getField("alpha_ratio")
    val stopOk = least(f.getField("stopword_ratio") * 5.0, lit(1.0))
    (lenOk * 0.25 + tokLenOk * 0.25 + alphaOk * 0.25 + stopOk * 0.25)
  }

  // ---- repetition signals (Gopher, Rae et al. 2021) --------------------

  /** Slot names of the 13 repetition signals, in kernel array order. */
  val repetitionSignalNames: Seq[String] = Seq(
    "dup_line_frac", "dup_line_char_frac",
    "dup_para_frac", "dup_para_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
    "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
    "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")

  /** Per-document repetition signals as a named struct (one fused kernel
    * pass; the struct is a zero-cost view over the returned array). */
  def repetitionSignals(text: Column): Column = {
    val a = Functional.repetitionSignals(text)
    struct(repetitionSignalNames.zipWithIndex.map { case (n, i) =>
      element_at(a, i + 1).as(n)
    }: _*)
  }

  /** Gopher's published repetition thresholds (Rae et al. 2021, Table
    * A1), in kernel slot order: a document is repetition-clean when
    * every signal is <= its threshold. */
  val gopherRepetitionThresholds: Seq[Double] = Seq(
    0.30, 0.20, 0.30, 0.20, // dup line/para (frac, char-frac)
    0.20, 0.18, 0.16, // top 2/3/4-gram
    0.15, 0.14, 0.13, 0.12, 0.11, 0.10) // dup 5..10-gram

  /** True when the document passes every Gopher repetition filter. */
  def gopherRepetitionOk(text: Column): Column = {
    val a = Functional.repetitionSignals(text)
    gopherRepetitionThresholds.zipWithIndex
      .map { case (t, i) => element_at(a, i + 1) <= t }
      .reduce(_ && _)
  }

  /** Stable 64-bit content fingerprint (FNV-1a kernel). */
  def fingerprint(text: Column): Column = Functional.fingerprint64(text)

  // ---- C4-style document filter (Raffel et al. 2020, §2.2) -------------

  /** Count of the most frequent whitespace token — exact and row-local:
    * sort the token array, take the longest equal run (the HOF fold
    * stays inside whole-stage codegen; no explode, no shuffle). NULL
    * text → NULL. */
  def topTokenCount(text: Column): Column = {
    val sorted = array_sort(tokens(text))
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Stopword list the C4 filter checks for (the en profile). */
  val c4Stopwords: Seq[String] = stopwordProfiles("en")

  /** C4-style document-level quality filter (Raffel et al. 2020 §2.2,
    * adapted from line statistics to word statistics since this corpus
    * is single-line): a document is kept when it
    *  1. has `minWords`..`maxWords` words,
    *  2. has mean word length in [meanLenMin10x, meanLenMax10x] tenths
    *     of a character (C4's 3..10 band, tightened to 4.2 for this
    *     vocabulary),
    *  3. devotes <= topWordMaxPct % of its words to a single word
    *     (the Gopher top-gram repetition rule at gram = 1),
    *  4. contains >= minStopwords DISTINCT English stopwords (C4's
    *     "terminal punctuation / natural language" proxy), and
    *  5. contains no banned phrase ("lorem ipsum", "javascript" —
    *     C4's blocklist rule).
    * Returns struct(keep, reason) where reason is the FIRST failed
    * rule name in the order above, NULL when kept.
    *
    * Every threshold is an INTEGER comparison (mean length via
    * 10·sumLen vs bound·n, fraction via 100·top vs pct·n) so any SQL
    * engine reproduces the verdict bit-for-bit — no FP epsilon in the
    * keep/drop decision. One scan, pure column expressions, no
    * shuffle: the 100 TB cost is the read. */
  def c4Filter(text: Column,
      minWords: Int = 15, maxWords: Int = 10000,
      meanLenMin10x: Int = 42, meanLenMax10x: Int = 100,
      topWordMaxPct: Int = 20, minStopwords: Int = 2,
      banned: Seq[String] = Seq("lorem ipsum", "javascript")): Column = {
    val toks = tokens(text)
    val n = coalesce(size(toks), lit(0)).cast(LongType)
    val sumLen = coalesce(length(regexp_replace(text, "\\s", "")), lit(0))
      .cast(LongType)
    val topc = coalesce(topTokenCount(text), lit(0)).cast(LongType)
    val nstop = coalesce(
      size(array_intersect(toks, array(c4Stopwords.map(lit): _*))),
      lit(0))
    val isBanned = coalesce(
      banned.map(b => lower(text).contains(b)).reduce(_ || _), lit(false))
    val reason = when(n < minWords || n > maxWords, "word_count")
      .when(sumLen * 10 < n * meanLenMin10x ||
        sumLen * 10 > n * meanLenMax10x, "word_length")
      .when(topc * 100 > n * topWordMaxPct, "repetition")
      .when(nstop < minStopwords, "stopwords")
      .when(isBanned, "banned")
      .otherwise(lit(null).cast(StringType))
    struct(reason.isNull.as("keep"), reason.as("reason"))
  }

  /** Winnowing fingerprint set (rolling-hash k-grams, window-minimum
    * selection — Schleimer et al., SIGMOD'03). Position-independent
    * local fingerprints: docs sharing any run of >= w + k - 1 bytes
    * share a fingerprint, so partial overlap is detectable where the
    * whole-document [[fingerprint]] only catches exact copies. Expected
    * density 2/(w+1) fingerprints per k-gram — at 100 TB the selected
    * set (not the text) is what shuffles in a fingerprint-join dedup. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 16): Column =
    Functional.winnow(text, k, w)

  // ---- TF-IDF ---------------------------------------------------------

  /** Top-`k` TF-IDF terms per document: score = tf × ln(N / df) with
    * raw term counts, deterministic tie-break (score desc, term asc).
    * Returns (idCol, term, score, rk).
    *
    * Scale shape: the term-frequency aggregation shuffles (id, term)
    * pairs once; the document-frequency table is VOCABULARY-sized
    * (millions of rows against billions of docs) so it and the 1-row
    * corpus count broadcast back — the per-doc ranking window then
    * re-shuffles only (id, term, score). The corpus text never moves
    * twice. */
  def tfIdfTopTerms(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is already distinct on (id, term): df = plain count per term
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count_distinct(col(idCol)).as("n"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("n").cast(DoubleType) / col("df").cast(DoubleType)))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk"))
  }

  // ---- n-gram LM perplexity (CCNet-style quality filter) --------------

  /** Per-document bigram-LM perplexity — the CCNet/C4 quality-filter
    * pattern (Wenzek et al. 2020 score with a KenLM model; this is the
    * self-contained equivalent: an add-alpha bigram model estimated
    * from the corpus itself, or from whatever reference `df` is
    * passed). Returns (idCol, n_bigrams, ppl) for documents with >= 2
    * tokens, where ppl = exp(-mean log P(w2|w1)) and
    * P(w2|w1) = (c(w1 w2) + alpha) / (c(w1) + alpha·|V|).
    *
    * Determinism: the per-bigram log-probs are cast to DECIMAL(25,12)
    * before the per-doc sum, so the mean is independent of partition
    * order (double summation would be association-sensitive); the
    * DuckDB oracle replays the identical expression chain.
    *
    * Scale shape: the bigram/unigram count tables are
    * vocabulary-sized, broadcast back onto a single corpus scan; at
    * web scale you prune the LM (count floors) or switch the c2 probe
    * to a shuffle join on the bigram key — the corpus side stays one
    * scan either way. */
  def bigramPerplexity(
      df: DataFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    val uni = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val c1 = uni.groupBy("term").agg(count(lit(1)).as("c1"))
    val v = uni.agg(count_distinct(col("term")).as("v"))
    val big = df
      .where(size(tokens(col(textCol))) >= 2)
      .select(col(idCol), explode(shingles(col(textCol), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val c2 = big.groupBy("g").agg(count(lit(1)).as("c2"))
    big.join(broadcast(c2), "g")
      .join(broadcast(c1), col("w1") === col("term"))
      .crossJoin(broadcast(v))
      .withColumn("lp",
        log((col("c2") + alpha) / (col("c1") + lit(alpha) * col("v")))
          .cast(DecimalType(25, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        exp(-(sum(col("lp")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType))).as("ppl"))
  }

  // ---- PII scrubbing --------------------------------------------------

  /** Shared-dialect PII patterns (valid in both Java regex and RE2 —
    * no lookaround, no backreferences — so the DuckDB oracle can run
    * the identical pattern). Deliberately simple recall-oriented
    * shapes: email, NANP-style +1 phone, dotted-quad IPv4. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("phone", "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}|\\+1-[0-9]{3}-[0-9]{4}"),
    ("ipv4", "\\b([0-9]{1,3}\\.)([0-9]{1,3}\\.)([0-9]{1,3})\\.[0-9]{1,3}\\b"))

  /** Redact every PII match with `<EMAIL>`/`<PHONE>`/`<IPV4>` tokens.
    * A chain of codegen'd regexp_replace passes — single scan, no
    * shuffle, linear in the text. Email runs first so its dotted
    * domain can never be half-eaten by the IPv4 pass. */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, re)) =>
      regexp_replace(c, re, s"<${name.toUpperCase}>")
    }

  /** Per-kind PII match counts as a struct (n_email, n_phone, n_ipv4). */
  def piiCounts(text: Column): Column =
    struct(piiPatterns.map { case (name, re) =>
      size(regexp_extract_all(text, lit(re), lit(0))).as(s"n_$name")
    }: _*)

  /** Word k-shingles of a document: sliding windows of `k` tokens
    * joined by a space — the dedup unit for MinHash/Jaccard and the
    * n-gram unit for decontamination/perplexity. Fused single-pass
    * kernel (Kernels.wordShingles); semantics identical to the HOF
    * chain `transform(sequence(0, n-k), i -> array_join(slice(toks,
    * i+1, k), " "))` with the `n < k` whole-text fallback
    * (ShinglesParitySpec pins the equivalence, edge cases included). */
  def shingles(text: Column, k: Int): Column =
    Functional.wordShingles(text, k)

  // ---- vocabulary building --------------------------------------------

  /** Build a frequency vocabulary from a corpus: the `maxSize` most
    * frequent tokens with count ≥ `minFreq`, assigned contiguous ids
    * from `startId` in (count desc, term asc) order — deterministic,
    * so the vocabulary is reproducible and engine-portable. Returns
    * (term, term_id, count). The output feeds lookup_indices /
    * [[graft.functions.Bpe.Vocab]]: build once over the corpus, ship
    * the (tiny) vocab as a broadcast asset.
    *
    * Scale shape: one scan + one map-side-partial count aggregation on
    * the term; the top-K step ranks the VOCABULARY (≤ distinct terms),
    * not the corpus. For web-scale vocabularies the rank is a single
    * shuffle of (term, count) pairs — still corpus-size-independent. */
  def buildVocab(
      df: DataFrame,
      textCol: String,
      maxSize: Int,
      minFreq: Long = 1L,
      startId: Int = 0): DataFrame = {
    require(maxSize > 0 && minFreq >= 1, s"maxSize=$maxSize minFreq=$minFreq")
    val counts = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("count"))
      .where(col("count") >= minFreq)
    val w = Window.orderBy(col("count").desc, col("term").asc)
    counts
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxSize)
      .select(col("term"),
        (col("__rk") - 1 + startId).cast(LongType).as("term_id"),
        col("count"))
  }

  // ---- long-document chunking -----------------------------------------

  /** Split a document into chunks of at most `maxTokens` tokens with
    * `overlap` tokens of context carried between consecutive chunks —
    * the standard context-window preprocessing for long docs (chunk
    * stride = maxTokens − overlap). Returns array<struct<chunk_idx,
    * chunk_text, n_tokens>>; row-local (explode to one row per chunk),
    * no shuffle, codegen-friendly HOF composition. A doc of at most
    * `maxTokens` tokens yields exactly one whole-text chunk. */
  def chunk(text: Column, maxTokens: Int, overlap: Int): Column = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    // chunk starts: 0, stride, 2*stride, ... while start < n (a single
    // chunk when n <= maxTokens; last chunk may be shorter)
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlap)).cast(DoubleType) / stride).cast(IntegerType))
    transform(sequence(lit(0), nChunks - 1), i => {
      val start = i * stride
      val len = least(lit(maxTokens), n - start)
      struct(i.as("chunk_idx"),
        array_join(slice(toks, start + 1, len), " ").as("chunk_text"),
        len.cast(LongType).as("n_tokens"))
    })
  }

  // ---- DSIR importance weighting (Xie et al., NeurIPS 2023) -----------

  /** Hashed n-gram feature buckets of a document: every unigram and
    * bigram, xxhash64-folded into [0, nBuckets) — the DSIR feature
    * space. Row-local, no shuffle. */
  def dsirBuckets(text: Column, nBuckets: Int): Column =
    transform(concat(shingles(text, 1), shingles(text, 2)),
      g => pmod(xxhash64(g), lit(nBuckets.toLong)).cast(IntegerType))

  /** Fit the DSIR log-importance table: per-bucket
    * log p_target(k) − log p_raw(k) with add-`alpha` smoothing.
    *
    * Scale shape: each corpus is ONE scan + a map-side-partial count
    * aggregation on the bucket id — the collect is bounded at
    * `nBuckets` rows (the feature table is KBs; DSIR's point is that a
    * hashed generative model of the target domain is tiny). The result
    * ships to executors as a literal, so scoring is a single
    * codegen'd scan with an O(1) table lookup per gram — the raw
    * corpus text never shuffles. Driver arithmetic is exact integer
    * counts + IEEE log, so the table is deterministic. */
  def dsirLogRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      nBuckets: Int = 4096,
      alpha: Double = 1.0): Array[Double] = {
    require(nBuckets > 0 && alpha > 0, s"nBuckets=$nBuckets alpha=$alpha")
    def counts(df: DataFrame): (Array[Long], Long) = {
      val rows = df
        .select(explode(dsirBuckets(col(textCol), nBuckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .collect()
      val arr = new Array[Long](nBuckets)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      (arr, arr.sum)
    }
    val (t, tTot) = counts(target)
    val (r, rTot) = counts(raw)
    Array.tabulate(nBuckets)(k =>
      math.log((t(k) + alpha) / (tTot + alpha * nBuckets)) -
        math.log((r(k) + alpha) / (rTot + alpha * nBuckets)))
  }

  /** Per-document DSIR importance log-weight: the sum of fitted bucket
    * log-ratios over the document's grams. exp(score) is the
    * importance-resampling weight; in practice rank or threshold the
    * log directly, or feed it to [[Sampling]] for the resample step.
    * Row-local (gram order is the document's own), fully codegen'd. */
  def dsirScore(text: Column, logRatios: Array[Double],
      nBuckets: Int): Column = {
    require(logRatios.length == nBuckets,
      s"table has ${logRatios.length} entries, expected $nBuckets")
    aggregate(dsirBuckets(text, nBuckets), lit(0.0),
      (acc, b) => acc + element_at(lit(logRatios), b + 1))
  }
}
