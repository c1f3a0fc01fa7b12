package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich, Haddow & Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016,
  * Algorithm 1) — the counterpart the reference lacks: torcharrow only
  * ENCODES with pre-trained GPT-2 tables
  * (csrc/velox/text/gpt2_bpe_tokenizer.cpp); a training-data pipeline
  * also has to LEARN the tables from its own corpus.
  *
  * Scale design: BPE training operates on the WORD-FREQUENCY table,
  * not the raw text — one distributed count aggregation reduces
  * 100 TB of corpus to a vocabulary-sized table (the same shape as
  * TextAnalysis.buildVocab), and the merge loop runs driver-side over
  * that table with cost independent of corpus size. The driver loop
  * maintains pair counts INCREMENTALLY (only words containing the
  * just-merged pair are reprocessed — the occurrence index makes each
  * merge O(words touched), not O(vocabulary)), so tens of thousands
  * of merges over a web-scale vocabulary are tractable.
  *
  * Output plugs straight into [[BpeEncoder]]: merges are ranked in
  * creation order and symbols live in the GPT-2 byte→unicode space
  * when `byteLevel` (ids 0-255 = base bytes, 256+rank = merge
  * results — the GPT-2 vocabulary convention).
  */
object BpeTrain {

  /** Deterministic pair-selection order: highest count first, ties
    * broken by the lexicographically SMALLEST (left, right) pair — so
    * training is reproducible across runs and engines. */
  private val selectionOrder: Ordering[(Long, (String, String))] =
    Ordering.by[(Long, (String, String)), Long](_._1).orElse(
      Ordering.by[(Long, (String, String)), (String, String)](_._2)(
        Ordering.Tuple2(Ordering.String.reverse, Ordering.String.reverse)))

  /** Learn `numMerges` merges from (word, count) pairs. Returns
    * (mergeRanks, vocab) in [[BpeEncoder]]'s shapes. Training stops
    * early when no adjacent pair reaches `minPairFreq`. */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      byteLevel: Boolean = true,
      minPairFreq: Long = 2L)
      : (Map[(String, String), Int], Map[String, Long]) = {
    require(numMerges >= 0, s"numMerges=$numMerges")
    require(minPairFreq >= 1, s"minPairFreq=$minPairFreq")
    val b2u = BpeEncoder.byteToUnicode
    def toUnits(w: String): mutable.ArrayBuffer[String] = {
      val buf = new mutable.ArrayBuffer[String](w.length)
      if (byteLevel) w.getBytes("UTF-8").foreach(b =>
        buf += b2u(b & 0xff).toString)
      else w.foreach(c => buf += c.toString)
      buf
    }
    val words = wordCounts.map { case (w, c) =>
      require(c > 0, s"non-positive count for word '$w'")
      (toUnits(w), c)
    }.toArray
    // char-level base alphabet, snapshotted BEFORE the merge loop
    // mutates the unit buffers in place — deriving it afterwards would
    // lose every base symbol that only occurs inside merged tokens
    val baseUnits: Array[String] =
      if (byteLevel) Array.empty
      else words.flatMap(_._1).distinct.sorted

    // pair -> total weighted count; pair -> word indices containing it
    // (the occurrence index driving incremental updates); and a
    // lazy-deletion max-heap over (count, pair) — every count change
    // pushes a fresh entry, pops discard entries whose stored count no
    // longer matches, so each merge costs O(words touched · log) not
    // O(pair table).
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val heap =
      mutable.PriorityQueue.empty[(Long, (String, String))](selectionOrder)
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val (units, c) = words(wi)
      var i = 0
      while (i < units.length - 1) {
        val p = (units(i), units(i + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * c
        if (nc == 0L) pairCount.remove(p)
        else {
          pairCount(p) = nc
          heap.enqueue((nc, p))
        }
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && !done && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (pairCount.getOrElse(p, 0L) == c) {
          if (c >= minPairFreq) best = p
          else done = true // heap max below threshold: nothing left
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val touched = pairWords.getOrElse(best, mutable.HashSet.empty)
          .toArray
        pairWords.remove(best)
        touched.foreach { wi =>
          val (units, _) = words(wi)
          addWordPairs(wi, -1L) // retract this word's old pairs
          // apply the merge left-to-right, non-overlapping
          var i = 0
          while (i < units.length - 1) {
            if (units(i) == best._1 && units(i + 1) == best._2) {
              units(i) = best._1 + best._2
              units.remove(i + 1)
            }
            i += 1
          }
          addWordPairs(wi, 1L) // re-add under the new segmentation
        }
      }
    }

    val mergeRanks = merges.zipWithIndex.toMap
    val vocab: Map[String, Long] =
      if (byteLevel)
        (0 until 256).map(b => b2u(b).toString -> b.toLong).toMap ++
          merges.zipWithIndex.map { case ((l, r), i) =>
            (l + r) -> (256L + i)
          }
      else
        baseUnits.zipWithIndex.map { case (u, i) => u -> i.toLong }.toMap ++
          merges.zipWithIndex.map { case ((l, r), i) =>
            (l + r) -> (baseUnits.length.toLong + i)
          }
    (mergeRanks, vocab)
  }

  /** Distributed front half: whitespace word counts from `textCol`
    * (one corpus scan, the buildVocab shape), capped at `maxVocab`
    * distinct words with a clear error (the driver-side merge loop is
    * vocabulary-sized — fail fast instead of OOMing the driver, the
    * collectRows discipline), then [[train]]. */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 1 << 20,
      minWordFreq: Long = 1L,
      byteLevel: Boolean = true)
      : (Map[(String, String), Int], Map[String, Long]) = {
    val counts = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= minWordFreq)
    // one scan: collect maxVocab+1 rows and check the cap on the
    // driver instead of running the count aggregation twice
    val wc = counts.limit(maxVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(wc.length <= maxVocab,
      s"BpeTrain: corpus has more than $maxVocab distinct words — " +
        "raise maxVocab or minWordFreq (the merge loop is driver-side " +
        "and vocabulary-sized)")
    train(wc, numMerges, byteLevel)
  }
}
