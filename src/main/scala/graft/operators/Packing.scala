package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: greedy first-fit-in-order assembly of documents
  * into training sequences of at most `maxTokens` tokens — the step
  * between a shuffled corpus and a pre-training data loader (padding
  * waste is the price of unpacked short docs; packing recovers it).
  *
  * Scale shape: packing is PER-PARTITION imperative logic — the one
  * place mapPartitions is the right tool (SURVEY §7.3's "last resort"
  * case): each partition walks its rows once, in order, carrying only
  * (current sequence id, tokens used) as state. No shuffle beyond the
  * deterministic global order the caller established; sequence ids are
  * globally unique without coordination ((partitionId << 32) | local).
  * The efficiency loss vs. global bin packing is at most one partial
  * sequence per partition — negligible when partitions hold thousands
  * of docs, the 100 TB case.
  *
  * Determinism: pack AFTER a deterministic order + explicit partition
  * count (e.g. repartitionByRange on [[Sampling.shuffleKey]] then
  * sortWithinPartitions) — then the full (doc → sequence, position)
  * assignment is reproducible across runs and cluster sizes.
  *
  * Reference analog: none — torcharrow stops at per-column transforms;
  * packing is part of the training-data extension surface.
  */
object Packing {

  /** Pack `df` rows, in their current partition order, into sequences
    * of at most `maxTokens` (docs longer than `maxTokens` become
    * singleton oversize sequences — chunk upstream if unwanted).
    * Input needs (idCol: long, tokenCol: long); returns
    * (idCol, seq_id, seq_pos, n_tokens) with one row per input doc. */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens=$maxTokens")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_pos", IntegerType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    // Contract check up front (mirrors Clustering.fit): a null id or
    // token count fails with a clear message instead of an NPE deep in
    // a task. The raise_error rides the same projection — no extra pass.
    val in = df.select(
      when(col(idCol).isNull, raise_error(lit(
        s"packGreedy: null $idCol — ids must be non-null")))
        .otherwise(col(idCol).cast(LongType)).as(idCol),
      when(col(tokenCol).isNull, raise_error(lit(
        s"packGreedy: null $tokenCol — filter or fill null token " +
          "counts upstream")))
        .when(col(tokenCol) < 0, raise_error(lit(
          s"packGreedy: negative $tokenCol — a negative count shrinks " +
            "the running budget and lets later sequences exceed " +
            "maxTokens")))
        .otherwise(col(tokenCol).cast(LongType)).as(tokenCol))
    in.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var localSeq = -1L
      var used = maxTokens + 1L // forces a new sequence on the first doc
      var pos = 0
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        if (used + n > maxTokens) { localSeq += 1; used = 0L; pos = 0 }
        used += n
        pos += 1
        Row(id, (pid << 32) | localSeq, pos - 1, n)
      }
    }(Encoders.row(outSchema))
  }

  /** Pad-or-truncate a ragged array column to exactly `len` elements
    * with `pad` — the fixed-`max_seq_len` loader contract (the
    * reference's batch-max variant is [[padToMax]]; both realize
    * test/test_interop.py:148 `base_test_pad_sequence`, which pads
    * ragged int/float lists with a caller-chosen padding value).
    *
    * Row-local Catalyst collection expressions only (slice +
    * array_repeat + concat) — whole-stage codegen'd, no UDF, no
    * shuffle, element type preserved. A NULL list yields NULL
    * (standard collection-function propagation; raise upstream if a
    * null sequence is a contract violation). */
  def padToLength(arr: Column, len: Int, pad: Column): Column = {
    require(len > 0, s"padToLength: need len >= 1, got $len")
    concat(slice(arr, 1, len),
      array_repeat(pad, greatest(lit(len) - size(arr), lit(0))))
  }

  /** [[padToLength]] with LEFT truncation: sequences longer than `len`
    * keep their last `len` elements (the chat-context windowing rule —
    * the most recent tokens survive), shorter ones right-pad exactly
    * like padToLength. Same row-local codegen shape; the branch is a
    * when() on size, not a second pass. */
  def padToLengthKeepEnd(arr: Column, len: Int, pad: Column): Column = {
    require(len > 0, s"padToLengthKeepEnd: need len >= 1, got $len")
    when(size(arr) > len,
      slice(arr, size(arr) - lit(len) + lit(1), lit(len)))
      .otherwise(padToLength(arr, len, pad))
  }

  /** Attention mask companion of [[padToLength]]: an int array of
    * exactly `len` entries, 1 where the padded slot holds a real
    * element and 0 where it holds padding. NULL list -> NULL. */
  def attentionMask(arr: Column, len: Int): Column = {
    require(len > 0, s"attentionMask: need len >= 1, got $len")
    when(arr.isNull, lit(null)).otherwise(
      transform(sequence(lit(0), lit(len - 1)),
        i => when(i < least(size(arr), lit(len)), lit(1)).otherwise(lit(0))
          .cast(IntegerType)))
  }

  /** Reference-exact batch-max padding: every list in `arrCol` is
    * padded (never truncated) to the LONGEST list in the frame, the
    * `PadSequence` semantics of test/test_interop.py:190. The batch
    * max is one scalar aggregate (a single-row driver collect —
    * bounded at any corpus size); the padding itself is the row-local
    * [[padToLength]] expression. Returns the frame with `outCol`
    * added; an all-null or empty frame pads to nothing (outCol =
    * empty/null arrays). */
  def padToMax(
      df: DataFrame,
      arrCol: String,
      outCol: String,
      pad: Column): DataFrame = {
    val maxLen = df.agg(max(size(col(arrCol)))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    if (maxLen <= 0) df.withColumn(outCol, col(arrCol))
    else df.withColumn(outCol, padToLength(col(arrCol), maxLen, pad))
  }
}
