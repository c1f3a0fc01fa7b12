package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span corruption: the denoising-objective prep step between
  * a tokenized corpus and a seq2seq training loader (Raffel et al.
  * 2020, §3.1.4 "span corruption"). A deterministic fraction of token
  * positions is masked; RUNS of consecutive masked tokens collapse to
  * one `<extra_id_k>` sentinel in the encoder input, and the decoder
  * target lists each sentinel followed by the tokens it hid.
  *
  * Determinism: mask selection is the same stateless splitmix64 bucket
  * as [[Sampling]] (no `rand()`), keyed on `id * posSpace + pos` — so
  * the corruption of a document is a pure function of (id, seed),
  * reproducible across runs, cluster sizes, and engines (the q83-
  * precedent DuckDB restatement replays it bit-for-bit, gate q252).
  *
  * Scale shape: posexplode is row-local; the span arithmetic is ONE
  * window partitioning on the doc id (lag + running sum share it) and
  * the rebuild is a groupBy on the SAME key — Spark reuses the
  * exchange, so the whole op costs one shuffle of (id, pos, token)
  * triplets. No driver state, no UDFs; everything is codegen-friendly
  * expressions.
  *
  * Reference analog: none — torcharrow stops at tokenization
  * (bpe_tokenize, add_tokens); objective prep is part of the
  * training-data extension surface, beside [[Packing]].
  */
object Denoise {

  /** Position-space stride for the mask key: `id * PosSpace + pos`
    * must not collide across docs, so token arrays longer than
    * PosSpace are rejected. 4096 keeps the key non-overflowing for
    * any id < 2^51. */
  val PosSpace = 4096

  /** Corrupt `toksCol` (array of string tokens) of `df` at `density`
    * (fraction of positions masked, [[Sampling.threshold]] floor
    * granularity). Returns one row per input row:
    * (idCol, input_str, target_str, n_masked, n_spans) — strings are
    * space-joined (loader-ready), empty (not null) when nothing was
    * masked or nothing survived. Null/empty token arrays yield empty
    * strings with zero counts. */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      density: Double,
      seed: Long): DataFrame = {
    val thr = Sampling.threshold(density)
    val masked = explodeMasked(df, idCol, toksCol, "spanCorrupt",
      (id, pos, _) =>
        Sampling.bucket(id * PosSpace + pos, seed) < lit(thr))
    sentinelRebuild(masked, idCol)
  }

  /** posexplode `toksCol` with the PosSpace guard and a caller-chosen
    * per-position mask predicate (id, pos, n) => masked. Emits
    * (idCol, n, pos, tok, __m); null/empty arrays yield one null-pos
    * row with __m = false (so the doc survives to the rebuild). */
  private def explodeMasked(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      opName: String,
      mask: (Column, Column, Column) => Column): DataFrame = {
    val tok = df.select(col(idCol), size(col(toksCol)).as("__n"),
      posexplode_outer(col(toksCol)).as(Seq("pos", "tok")))
    // guard, not silent truncation: a doc longer than PosSpace would
    // collide its mask keys with the next doc id's positions
    val guarded = tok.withColumn("tok",
      when(col("pos") >= PosSpace, raise_error(lit(
        s"$opName: token array longer than $PosSpace — chunk " +
          "upstream or widen PosSpace"))).otherwise(col("tok")))
    guarded.withColumn("__m",
      col("pos").isNotNull &&
        mask(col(idCol), col("pos"), col("__n")))
  }

  /** The T5 sentinel-collapse rebuild over a masked exploded frame
    * (the shared second half of [[spanCorrupt]] and
    * [[spanCorruptMixture]]): one window partitioning on the doc id
    * shared by lag + running sum, then a groupBy on the SAME key. */
  private def sentinelRebuild(masked: DataFrame, idCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = masked
      .withColumn("__start", col("__m") &&
        !coalesce(lag(col("__m"), 1).over(w), lit(false)))
      // 0-based sentinel index of the span this row belongs to
      .withColumn("__k",
        sum(when(col("__start"), 1L).otherwise(0L)).over(w) - 1L)
    val sentinel = concat(lit("<extra_id_"), col("__k"), lit(">"))
    val pieces = spans.select(col(idCol), col("pos"),
      when(col("pos").isNotNull && !col("__m"), col("tok"))
        .when(col("__start"), sentinel).as("in_piece"),
      when(col("__m"),
        when(col("__start"), concat(sentinel, lit(" "), col("tok")))
          .otherwise(col("tok"))).as("tgt_piece"),
      col("__m"), col("__start"))
    def joined(piece: String): Column = array_join(
      transform(
        array_sort(collect_list(when(col(piece).isNotNull,
          struct(col("pos"), col(piece).as("p"))))),
        _.getField("p")), " ")
    pieces.groupBy(col(idCol)).agg(
      joined("in_piece").as("input_str"),
      joined("tgt_piece").as("target_str"),
      coalesce(sum(when(col("__m"), 1L).otherwise(0L)), lit(0L))
        .as("n_masked"),
      coalesce(sum(when(col("__start"), 1L).otherwise(0L)), lit(0L))
        .as("n_spans"))
  }

  /** UL2 mixture-of-denoisers (Tay et al. 2022, "UL2: Unifying
    * Language Learning Paradigms"): each document is routed to ONE of
    * three denoising objectives by a doc-level splitmix64 draw (seed
    * `seed + 7`, uniform over 3), and the encoder input is prefixed
    * with the objective's mode token:
    *  - `[R]` regular span corruption at `rDensity` (the q252 path),
    *  - `[S]` sequential / prefix-LM: the LAST ceil(n/4) positions are
    *    masked as one tail span (the model continues the document),
    *  - `[X]` extreme corruption at `xDensity`.
    * Span collapse, sentinel numbering, and the target stream are the
    * shared T5 rebuild ([[spanCorrupt]]); all draws are pure functions
    * of (id, seed), replayed bit-for-bit by gate q258's DuckDB oracle.
    * Scale shape: identical to spanCorrupt — ONE doc-id shuffle shared
    * by the windows and the rebuild; the mode-token prepend is
    * row-local arithmetic on the id, not a join. */
  def spanCorruptMixture(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      seed: Long,
      rDensity: Double = 0.15,
      xDensity: Double = 0.5): DataFrame = {
    val thrR = Sampling.threshold(rDensity)
    val thrX = Sampling.threshold(xDensity)
    def cfg(id: Column): Column = Sampling.bucket(id, seed + 7) % 3
    val masked = explodeMasked(df, idCol, toksCol, "spanCorruptMixture",
      (id, pos, n) => {
        val bucketed = Sampling.bucket(id * PosSpace + pos, seed)
        // ceil(n/4) tail positions, exactly: (n+3) >> 2
        val sCut = n - shiftright((n + 3).cast("long"), 2).cast("int")
        when(cfg(id) === 0, bucketed < lit(thrR))
          .when(cfg(id) === 2, bucketed < lit(thrX))
          .otherwise(pos >= sCut)
      })
    val out = sentinelRebuild(masked, idCol)
    val mode = element_at(
      array(lit("[R]"), lit("[S]"), lit("[X]")), cfg(col(idCol)) + 1)
    out.select(col(idCol),
      mode.as("denoiser"),
      when(col("input_str") === "", mode)
        .otherwise(concat(mode, lit(" "), col("input_str")))
        .as("input_str"),
      col("target_str"), col("n_masked"), col("n_spans"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): a
    * deterministic `fimRate` fraction of documents is rearranged so
    * the model learns to infill — two cut points split the token
    * array into (prefix, middle, suffix) and the output is emitted in
    * BOTH documented orders:
    *  - PSM: `<fim_prefix> P <fim_suffix> S <fim_middle> M`
    *  - SPM: `<fim_suffix> S <fim_prefix> P <fim_middle> M`
    * (sentinels always present in a transformed doc, even around
    * empty segments — the loader's split contract). Untransformed
    * docs pass through as the plain space-joined tokens in both
    * columns with (n_prefix, n_middle, n_suffix) = (n, 0, 0).
    *
    * Determinism: the apply draw and both cut draws are doc-level
    * splitmix64 buckets (seeds `seed`/`seed+1`/`seed+2`); cuts are
    * `bucket % (n+1)` so every split position (including empty
    * prefix/middle/suffix) is reachable. A pure function of
    * (id, seed) — gate q254's DuckDB oracle replays it bit-for-bit.
    *
    * Scale shape: entirely row-local collection expressions — ZERO
    * shuffles, one scan, codegen-friendly (plan-asserted in
    * DenoiseSpec). Null token arrays yield null strings with zero
    * counts and fim_applied = false. */
  def fimTransform(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      fimRate: Double,
      seed: Long): DataFrame = {
    val thr = Sampling.threshold(fimRate)
    val id = col(idCol)
    val toks = col(toksCol)
    val n = size(toks)
    val applied = toks.isNotNull &&
      Sampling.bucket(id, seed) < lit(thr)
    val c1 = Sampling.bucket(id, seed + 1) % (n + 1)
    val c2 = Sampling.bucket(id, seed + 2) % (n + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val prefix = slice(toks, lit(1), lo)
    val middle = slice(toks, lo + 1, hi - lo)
    val suffix = slice(toks, hi + 1, n - hi)
    def fmt(parts: Column*): Column = array_join(concat(parts: _*), " ")
    def tag(s: String): Column = array(lit(s))
    val psm = fmt(tag("<fim_prefix>"), prefix,
      tag("<fim_suffix>"), suffix, tag("<fim_middle>"), middle)
    val spm = fmt(tag("<fim_suffix>"), suffix,
      tag("<fim_prefix>"), prefix, tag("<fim_middle>"), middle)
    val plain = array_join(toks, " ")
    def cnt(c: Column): Column = coalesce(c.cast("long"), lit(0L))
    df.select(id,
      applied.as("fim_applied"),
      when(applied, psm).otherwise(plain).as("psm_str"),
      when(applied, spm).otherwise(plain).as("spm_str"),
      cnt(when(applied, size(prefix)).otherwise(n)).as("n_prefix"),
      cnt(when(applied, size(middle)).otherwise(lit(0))).as("n_middle"),
      cnt(when(applied, size(suffix)).otherwise(lit(0))).as("n_suffix"))
  }

  /** Next-sentence-prediction pair prep (Devlin et al. 2019, §3.1
    * "Task #2"): each document is split into segment A (first
    * ceil(n/2) tokens) and segment B (the rest); a deterministic
    * `swapRate` fraction of documents replaces B with ANOTHER
    * document's B segment (label `is_next = false`), the remainder
    * keep their own continuation (`is_next = true`).
    *
    * Partner selection is the shuffled-neighbor trick: documents are
    * laid out in splitmix64-shuffled order ([[Sampling.shuffleKey]])
    * inside `groups` deterministic hash groups, and the partner is
    * the NEXT document in that order (wrapping to the group's first) —
    * since the order is a pseudorandom permutation, the neighbor is a
    * draw from the corpus without a second pass or a skewed
    * self-join. A document alone in its group keeps its own B with
    * `is_next = true` (no partner exists); the swap draw, the group
    * assignment, and the order are all pure functions of (id, seed),
    * replayed bit-for-bit by gate q255's DuckDB oracle.
    *
    * Scale shape: ONE shuffle — the window partitioning on the group
    * id; all three window functions (lead, first, count) share its
    * sort. Only (id, segA, segB) move, never the raw text. Group
    * count bounds the per-task sort: size `groups` so corpus/groups
    * rows fit an executor (the gate uses 64 at test SFs). */
  def nspPairs(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      swapRate: Double,
      seed: Long,
      groups: Int = 64): DataFrame = {
    require(groups > 0, s"nspPairs: groups=$groups")
    val thr = Sampling.threshold(swapRate)
    val id = col(idCol)
    val n = size(col(toksCol))
    // ceil(n/2) via an exact long shift (Column./ is double division)
    val split = shiftright((n + 1).cast("long"), 1).cast("int")
    val base = df.select(id,
      slice(col(toksCol), lit(1), split).as("__a"),
      slice(col(toksCol), split + 1, greatest(n - split, lit(0)))
        .as("__b"),
      (Sampling.bucket(id, seed + 9) % groups).as("__g"),
      Sampling.shuffleKey(id, seed).as("__k"),
      (Sampling.bucket(id, seed + 1) < lit(thr)).as("__swap"))
    val wOrd = Window.partitionBy(col("__g")).orderBy(col("__k"), id)
    val wAll = wOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val partnerB = coalesce(lead(col("__b"), 1).over(wOrd),
      first(col("__b")).over(wAll))
    val partnerId = coalesce(lead(id, 1).over(wOrd),
      first(id).over(wAll))
    val hasPartner = count(lit(1)).over(wAll) >= 2
    val doSwap = col("__swap") && hasPartner
    base.select(id,
      array_join(col("__a"), " ").as("seg_a"),
      array_join(when(doSwap, partnerB).otherwise(col("__b")), " ")
        .as("seg_b"),
      (!doSwap).as("is_next"),
      when(doSwap, partnerId).otherwise(id).as("partner_id"))
  }

  /** BERT-style masked-LM prep (Devlin et al. 2019, §3.1): select
    * `density` of positions; of those, 80% become `[MASK]`, 10% are
    * replaced by a "random" token, 10% keep the original — and the
    * label stream records the true token at every selected position.
    *
    * Deterministic variant: all three draws (selection, 80/10/10
    * split, replacement position) are splitmix64 buckets on
    * `id * PosSpace + pos` with seeds `seed`/`seed+1`/`seed+2`, and
    * the "random" replacement is the doc's OWN token at bucket %
    * len — a pure function of (id, seed), replayable cross-engine
    * (gate q253).
    *
    * Scale shape: unlike [[spanCorrupt]], MLM has no cross-position
    * state — the whole op is higher-order functions over the token
    * array, ZERO shuffles, one scan, codegen-friendly. Null token
    * arrays yield null outputs with zero counts. Returns
    * (idCol, masked_str, labels_str, n_sel, n_mask, n_rand, n_keep);
    * labels_str is "pos:token" pairs space-joined. */
  def mlmMask(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      density: Double,
      seed: Long): DataFrame = {
    val thrSel = Sampling.threshold(density)
    // 80/10/10 split thresholds in bucket space (floor semantics,
    // same convention as Sampling.threshold)
    val maskThr = Sampling.threshold(0.8)
    val randThr = Sampling.threshold(0.9)
    val id = col(idCol)
    // guard, not silent truncation (same contract as spanCorrupt)
    val toks = when(size(col(toksCol)) > PosSpace, raise_error(lit(
      s"mlmMask: token array longer than $PosSpace — chunk upstream " +
        "or widen PosSpace"))).otherwise(col(toksCol))
    def keyAt(i: Column): Column = id * PosSpace + i.cast("long")
    def sel(i: Column): Column =
      Sampling.bucket(keyAt(i), seed) < lit(thrSel)
    def d2(i: Column): Column = Sampling.bucket(keyAt(i), seed + 1)
    def rtok(i: Column): Column = element_at(toks,
      (Sampling.bucket(keyAt(i), seed + 2) % size(toks)) + 1)
    val maskedArr = transform(toks, (t, i) =>
      when(!sel(i), t).otherwise(
        when(d2(i) < lit(maskThr), lit("[MASK]"))
          .when(d2(i) < lit(randThr), rtok(i))
          .otherwise(t)))
    // selected positions, 0-based (empty array when the doc is empty:
    // sequence(0, -1) would fabricate [0, -1], hence the size guard)
    val selPos = when(size(toks) === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(0), size(toks) - 1), i => sel(i)))
    val labels = transform(selPos, i => concat(i.cast("string"),
      lit(":"), element_at(toks, i + 1)))
    def branchCount(lo: Int, hi: Int): Column = coalesce(
      size(filter(selPos, i => d2(i) >= lit(lo) && d2(i) < lit(hi)))
        .cast("long"), lit(0L))
    df.select(id,
      array_join(maskedArr, " ").as("masked_str"),
      array_join(labels, " ").as("labels_str"),
      coalesce(size(selPos).cast("long"), lit(0L)).as("n_sel"),
      branchCount(0, maskThr).as("n_mask"),
      branchCount(maskThr, randThr).as("n_rand"),
      branchCount(randThr, Sampling.Buckets).as("n_keep"))
  }
  /** Supervised-fine-tuning example prep: concatenate prompt and
    * response token ids, mask the prompt out of the LABEL stream with
    * `ignoreIndex` (the cross-entropy ignore convention), append
    * `eosId` to both, and left-truncate to `maxLen` — dropping the
    * OLDEST prompt tokens first, never the supervised signal (HF
    * `DataCollatorForCompletionOnlyLM` semantics). The most common
    * objective-prep step there is, completing the family beside MLM /
    * T5 span / UL2 / FIM / NSP / preference pairs.
    *
    * Contracts, loudly enforced: null or empty prompt/response arrays
    * raise (an all-ignore example contributes zero gradient — filter
    * upstream); a response whose supervised span (|response| + 1 for
    * eos) exceeds `maxLen` raises rather than silently clipping the
    * training signal. Left-truncation removes only ignore-labeled
    * positions, so n_supervised = |response| + 1 always.
    *
    * Adds: input_ids, labels (same length, position-aligned),
    * n_tokens (post-truncation), n_supervised. Pure row-local
    * collection expressions — zero shuffles, codegen-friendly, scales
    * as the scan. */
  def sftMask(
      df: DataFrame,
      promptCol: String,
      responseCol: String,
      eosId: Long,
      maxLen: Int,
      ignoreIndex: Long = -100L): DataFrame = {
    require(maxLen >= 2,
      s"sftMask: maxLen=$maxLen cannot hold a response token + eos")
    val p = col(promptCol)
    val r = col(responseCol)
    val checkedP = when(p.isNull || size(p) === 0, raise_error(lit(
      s"sftMask: null or empty $promptCol — an all-ignore example " +
        "contributes zero gradient; filter upstream"))).otherwise(p)
    val checkedR = when(r.isNull || size(r) === 0, raise_error(lit(
      s"sftMask: null or empty $responseCol — nothing to supervise; " +
        "filter upstream")))
      .when(size(r) + 1 > maxLen, raise_error(lit(
        s"sftMask: response + eos exceeds maxLen=$maxLen — truncating " +
          "the supervised span silently corrupts training; raise " +
          "maxLen or split upstream"))).otherwise(r)
    val ids = concat(checkedP, checkedR, array(lit(eosId)))
    val labels = concat(
      transform(checkedP, _ => lit(ignoreIndex)),
      checkedR, array(lit(eosId)))
    val full = size(ids)
    def trunc(c: Column): Column =
      when(full > maxLen, slice(c, full - maxLen + 1, lit(maxLen)))
        .otherwise(c)
    df.withColumn("input_ids", trunc(ids))
      .withColumn("labels", trunc(labels))
      .withColumn("n_tokens", least(full, lit(maxLen)).cast("long"))
      .withColumn("n_supervised", (size(checkedR) + 1).cast("long"))
  }
}
