package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
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
}
