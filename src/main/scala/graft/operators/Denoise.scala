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
    val tok = df.select(col(idCol),
      posexplode_outer(col(toksCol)).as(Seq("pos", "tok")))
    // guard, not silent truncation: a doc longer than PosSpace would
    // collide its mask keys with the next doc id's positions
    val guarded = tok.withColumn("tok",
      when(col("pos") >= PosSpace, raise_error(lit(
        s"spanCorrupt: token array longer than $PosSpace — chunk " +
          "upstream or widen PosSpace"))).otherwise(col("tok")))
    val masked = guarded.withColumn("__m",
      col("pos").isNotNull &&
        Sampling.bucket(col(idCol) * PosSpace + col("pos"), seed)
          < lit(thr))
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
}
