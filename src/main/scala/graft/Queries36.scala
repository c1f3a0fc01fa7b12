package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Packing

/** Round-17 gates: the remaining oracle-split and materialization
  * companions from the round-16 verdict — SemDeDup survivor accounting
  * (q263, the last obvious no_oracle split, the q247/q248/q250
  * precedent), GPT-block materialization from the q257 offsets (q264,
  * the loader contract the block coordinates exist for), and the
  * BPE-true variant of the q256 batch-shape report (q265, real token
  * budgets instead of whitespace counts). Naming/oracle/float
  * conventions as in [[Queries]].
  */
object Queries36 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---- q263: SemDeDup survivor accounting, hashed ---------------------------

  /** The oracle-restatable half of q96's SemDeDup pipeline: run the
    * SAME cluster → within-cell cosine pairs → keep-best resolution
    * chain ([[Queries6.q96Frames]]) and emit the survivor accounting
    * as DATA — corpus size, kept count, dropped count, and the dropped
    * ids themselves. On this corpus the answer is fully determined
    * WITHOUT running the pipeline: the 0.95 threshold sits far above
    * every non-planted cosine (max corpus-corpus ~0.51, max
    * planted-corpus ~0.45, twin-cross ~0.01 — measured at all three
    * SFs), identical twin vectors always share a k-means cell and have
    * cosine exactly 1, and [[graft.operators.Dedup.resolveKeepBest]]
    * breaks the equal-norm tie toward the LOWER id — so the pair graph
    * is exactly the two planted twin pairs and the dropped set is
    * exactly the two higher twin ids. DuckDB states that closed-form
    * answer; a green hash proves the pipeline's conservation and
    * keep-policy cross-engine (what stays engine-defined in q96 is
    * only the k-means cell assignment, which this accounting is
    * invariant to). Plan: pair-graph-sized frames throughout; the only
    * corpus-sized ops are one count and one broadcast anti-join. */
  def q263SemSurvivors(s: SparkSession, dir: String): DataFrame = {
    val (emb, _, dropped) = Queries6.q96Frames(s, dir)
    val kept = emb.join(broadcast(dropped), Seq("vec_id"), "left_anti")
    kept.agg(count(lit(1)).as("n_kept"))
      .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_total"))))
      .crossJoin(broadcast(dropped.agg(
        count(lit(1)).as("n_dropped"),
        array_join(transform(array_sort(collect_list($"vec_id")),
          x => x.cast(StringType)), ",").as("dropped_ids"))))
      .select($"n_total", $"n_kept", $"n_dropped", $"dropped_ids")
  }

  /** Closed-form restatement: corpus + 4 planted twins; exactly one of
    * each twin pair survives (the lower id — the resolveKeepBest
    * equal-score tiebreak), so dropped = plantBase+1, plantBase+3. */
  val q263Sql: String =
    """SELECT
      |  (SELECT count(*) FROM embeddings) + 4 AS n_total,
      |  (SELECT count(*) FROM embeddings) + 2 AS n_kept,
      |  CAST(2 AS BIGINT) AS n_dropped,
      |  '1000000001,1000000003' AS dropped_ids""".stripMargin

  // ---- q264: GPT block materialization, hashed ------------------------------

  /** The loader contract q257's block coordinates exist for: emit the
    * ACTUAL packed block fragments — for every document and every
    * 128-token block it spans, the block id, the fragment's offset and
    * length inside the block, the fragment's tokens, doc-start/doc-end
    * flags, and the 128-char document-boundary attention mask (1 where
    * the block position holds this document's tokens — the causal-mask
    * reset boundary a block-packed trainer needs). Layout is IDENTICAL
    * to q257 (same seed 13, 8 range partitions, token count + 1 EOS),
    * so the two gates corroborate: q257 proves the addresses, this
    * gate proves the contents at those addresses bit-for-bit.
    *
    * Scale shape: [[Packing.contiguousOffsets]] carries the token
    * array as PAYLOAD through the same two-phase prefix sum — no
    * corpus-sized join back to fetch text — and the blocks come from a
    * row-local explode over each doc's span: ONE range exchange total,
    * everything after it pipelined. The mask is a string (the driver
    * hash cannot compare list columns), pure arithmetic on
    * (frag_off, frag_len). DuckDB replays the shuffle key, the prefix
    * sum, and the slicing with generate_series + list_slice. */
  def q264BlockRows(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select($"doc_id",
        concat(split(trim($"text"), "\\s+"), array(lit("<eos>")))
          .as("toks"))
      .withColumn("len", size($"toks").cast(LongType))
    val off = Packing.contiguousOffsets(docs, "doc_id", "len",
      seed = 13L, parts = 8, payload = Seq("toks"))
    // 128 = 2^7: block id via exact shifts, in-block offset via the
    // low 7 bits (the q257 arithmetic — `/` on Columns is double
    // division, never used here)
    val inOff = $"global_start".bitwiseAND(127L)
    val ex = off
      .withColumn("k", explode(sequence(lit(0L),
        shiftright($"global_start" + $"len" - 1L, 7) -
          shiftright($"global_start", 7))))
      .withColumn("block_id", shiftright($"global_start", 7) + $"k")
      .withColumn("frag_off", when($"k" === 0L, inOff).otherwise(lit(0L)))
      .withColumn("__ts", greatest(lit(0L), $"k" * 128L - inOff))
      .withColumn("__te", least($"len", ($"k" + 1L) * 128L - inOff))
      .withColumn("frag_len", $"__te" - $"__ts")
    ex.select($"doc_id", $"block_id", $"frag_off", $"frag_len",
      array_join(slice($"toks", ($"__ts" + 1L).cast(IntegerType),
        $"frag_len".cast(IntegerType)), " ").as("frag_text"),
      ($"k" === 0L).as("is_doc_start"),
      ($"__te" === $"len").as("is_doc_end"),
      expr("repeat('0', CAST(frag_off AS INT)) || " +
        "repeat('1', CAST(frag_len AS INT)) || " +
        "repeat('0', CAST(128 - frag_off - frag_len AS INT))")
        .as("block_mask"))
  }

  val q264Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    string_split_regex(trim(text), '\\s+') || ['<eos>'] AS toks,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) + 1
       |      AS BIGINT) AS len
       |  FROM documents),
       |${Queries5.hashCtes("bk", 13L, "d", "doc_id")},
       |j AS (
       |  SELECT d.doc_id, d.toks, d.len, bkh.h
       |  FROM d JOIN bkh ON d.doc_id = bkh.k),
       |o AS (
       |  SELECT doc_id, toks, len,
       |    CAST(coalesce(sum(len) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS gs
       |  FROM j),
       |e AS (
       |  SELECT doc_id, toks, len, gs,
       |    CAST(unnest(range(0, (gs + len - 1) // 128 - gs // 128 + 1))
       |      AS BIGINT) AS k
       |  FROM o),
       |f AS (
       |  SELECT doc_id, toks, len, k,
       |    gs // 128 + k AS block_id,
       |    CASE WHEN k = 0 THEN gs % 128 ELSE 0 END AS frag_off,
       |    greatest(0, k * 128 - gs % 128) AS ts,
       |    least(len, (k + 1) * 128 - gs % 128) AS te
       |  FROM e)
       |SELECT doc_id,
       |  CAST(block_id AS BIGINT) AS block_id,
       |  CAST(frag_off AS BIGINT) AS frag_off,
       |  CAST(te - ts AS BIGINT) AS frag_len,
       |  array_to_string(list_slice(toks, ts + 1, te), ' ')
       |    AS frag_text,
       |  k = 0 AS is_doc_start,
       |  te = len AS is_doc_end,
       |  repeat('0', CAST(frag_off AS INT)) ||
       |    repeat('1', CAST(te - ts AS INT)) ||
       |    repeat('0', CAST(128 - frag_off - (te - ts) AS INT))
       |    AS block_mask
       |FROM f""".stripMargin

  // ---- q265: BPE-true length buckets, hashed --------------------------------

  /** The q256 batch-shape report with REAL token budgets: document
    * length measured by the q36 BPE encoder (the 10-rule fixture merge
    * table) instead of whitespace counts, then the same power-of-two
    * bucket/pad/truncation accounting. The scale path is the
    * dictionary trick: collect the corpus's DISTINCT words (a bounded,
    * vocabulary-sized collect — 31 here; hard-capped), encode each
    * word ONCE through the real [[graft.functions.BpeEncoder]] on the
    * driver, and ship the word → token-count dictionary as a broadcast
    * map literal the per-doc length expression looks up in codegen —
    * BPE runs |vocab| times, not |corpus| times, and the per-doc work
    * is a row-local map lookup + sum at any corpus size.
    *
    * The oracle restates per-word token counts HAND-DERIVED from the
    * merge table (the q36 VALUES precedent — e.g. "the"→1 via
    * t+h→th, th+e→the; "order"→3 via e+r→er rank 5 BEFORE o+r rank 9;
    * "window"→5 via i+n→in only), so a green hash proves the real
    * greedy-merge encoder, the dictionary plumbing, and the bucket
    * arithmetic cross-engine. A corpus word missing from the
    * dictionary cannot happen (it is built from the same frame); a
    * word missing from the ORACLE's 31-entry CASE yields NULL and
    * fails the hash loudly. */
  def q265BpeLenBuckets(s: SparkSession, dir: String): DataFrame = {
    val enc = Queries4.q36Encoder
    val words = t(s, dir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .distinct()
      .collect().map(_.getString(0))
    require(words.length <= 65536,
      s"q265: corpus vocabulary ${words.length} exceeds the dictionary " +
        "bound — dictionary-encode in a distributed pass instead")
    val dict = words.sorted.flatMap(w =>
      Seq(lit(w), lit(enc.encode(w).size.toLong)))
    val lens = map(dict.toIndexedSeq: _*)
    val len = aggregate(
      transform(split(trim($"text"), "\\s+"), w => element_at(lens, w)),
      lit(0L), (acc, x) => acc + x)
    val bounds = Seq(16, 32, 64, 128, 256, 512)
    t(s, dir, "documents")
      .select(Packing.lengthBucket(len, bounds).cast(LongType)
        .as("bucket_len"), len.as("len"))
      .groupBy($"bucket_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"len").cast(LongType).as("real_tokens"),
        sum($"bucket_len" - least($"len", $"bucket_len"))
          .cast(LongType).as("pad_slots"),
        sum(greatest($"len" - 512L, lit(0L))).cast(LongType)
          .as("trunc_tokens"))
      .orderBy($"bucket_len")
  }

  /** Per-word BPE token counts under the q36 merge table, derived
    * independently of the engine under test (greedy lowest-rank
    * adjacent merges applied by hand to each of the corpus's 31
    * words). */
  private val bpeWordLens: Seq[(String, Int)] = Seq(
    "a" -> 1, "agg" -> 3, "batch" -> 5, "big" -> 3, "column" -> 6,
    "customer" -> 7, "data" -> 4, "dup" -> 3, "fast" -> 4,
    "filter" -> 5, "group" -> 5, "hash" -> 4, "join" -> 3, "key" -> 3,
    "line" -> 3, "merge" -> 4, "order" -> 3, "part" -> 4, "query" -> 4,
    "row" -> 3, "scan" -> 3, "slow" -> 4, "small" -> 5, "sort" -> 3,
    "spark" -> 5, "stream" -> 5, "table" -> 5, "the" -> 1,
    "value" -> 5, "vector" -> 5, "window" -> 5)

  val q265Sql: String = {
    val cases = bpeWordLens
      .map { case (w, n) => s"WHEN '$w' THEN $n" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT CAST(list_sum(list_transform(
       |    string_split_regex(trim(text), '\\s+'),
       |    t -> CASE t $cases END)) AS BIGINT) AS len
       |  FROM documents),
       |b AS (
       |  SELECT len,
       |    CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
       |         WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
       |         WHEN len <= 256 THEN 256 ELSE 512 END AS bucket_len
       |  FROM d)
       |SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
       |  count(*) AS n_docs,
       |  CAST(sum(len) AS BIGINT) AS real_tokens,
       |  CAST(sum(bucket_len - least(len, bucket_len)) AS BIGINT)
       |    AS pad_slots,
       |  CAST(sum(greatest(len - 512, 0)) AS BIGINT) AS trunc_tokens
       |FROM b GROUP BY bucket_len
       |ORDER BY bucket_len""".stripMargin
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_sem_survivors" -> (q263SemSurvivors _),
    "q264_block_rows" -> (q264BlockRows _),
    "q265_bpe_len_buckets" -> (q265BpeLenBuckets _)
  )

  val oracles: Map[String, String] = Map(
    "q263_sem_survivors" -> q263Sql,
    "q264_block_rows" -> q264Sql,
    "q265_bpe_len_buckets" -> q265Sql
  )
}
