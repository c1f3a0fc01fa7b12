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
}
