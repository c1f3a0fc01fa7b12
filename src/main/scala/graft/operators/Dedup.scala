package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Scale design: every variant avoids all-pairs comparison. Exact dedup
  * is a single hash aggregation on the content fingerprint (partial agg
  * map-side, one shuffle on a 64-bit key — never on the full text).
  * Near-dup variants (MinHash-LSH, SimHash, embedding-LSH) shuffle only
  * (bucket-key, id) pairs and generate candidates within buckets, so
  * the quadratic step is confined to collision groups; `maxBucket`
  * caps degenerate buckets (boilerplate clusters) to bound skew.
  *
  * No silent caps: every LSH variant carries a constant
  * `dropped_candidates` column — the number of bucket memberships the
  * `maxBucket` cap removed — so a 100 TB run can see the recall the
  * cap cost it instead of candidates silently vanishing at skewed
  * buckets. 0 means the cap never fired. The cap+account discipline
  * itself lives in [[Skew.capGroups]] so non-dedup group-explosion
  * operators (graph wedge generation, q216) compose the same
  * primitive.
  */
object Dedup {

  /** Exact dedup, keep='first' by `orderCol` (lowest id wins — the
    * distributed-deterministic version of the reference's
    * drop_duplicates keep-first, icolumn.py:1066-1084). Returns the
    * kept rows. Aggregation instead of row_number: no per-group sort,
    * map-side partial min. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(Functional.fingerprint64(col(textCol)).as("__fp"),
        col(idCol).as("__id"))
      .groupBy("__fp").agg(min("__id").as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** CCNet-style cross-corpus paragraph dedup (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", 2019 — §3 dedups paragraphs by hash across shards): drop
    * every repeated paragraph, keeping its FIRST occurrence in
    * (id, position) order, and rebuild each document from its
    * surviving paragraphs. A document whose every paragraph occurred
    * earlier comes back with an empty array (kept, not dropped — the
    * caller's quality filter decides its fate, like CCNet).
    *
    * Input: (idCol integral, parasCol array<string>). Output:
    * (id, kept array<string>, n_paras, n_kept). Paragraph identity is
    * xxhash64 of the exact text (normalize upstream if desired); a
    * 64-bit collision would merge two distinct paragraphs — the same
    * accepted risk as [[exact]].
    *
    * Scale shape: only (hash, id, pos) triplets ever shuffle — the
    * explode is row-local and the text column never moves. Winner
    * selection is one min-struct aggregate (map-side partial, so a
    * boilerplate paragraph repeated 10^9 times reduces per-partition
    * first — no hot-key straggler). Winning positions re-group per
    * doc (light) and join back by id (uniform key); each doc then
    * filters its own paragraph array row-locally. */
  def dedupParagraphs(df: DataFrame, idCol: String, parasCol: String)
      : DataFrame = {
    val light = df
      .select(col(idCol).cast(LongType).as("id"),
        posexplode(col(parasCol)).as(Seq("pos", "para")))
      .select(col("id"), col("pos"), xxhash64(col("para")).as("ph"))
    val winners = light.groupBy("ph")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
      .select(col("w.id").as("id"), col("w.pos").as("pos"))
    val keptPos = winners.groupBy("id")
      .agg(sort_array(collect_list(col("pos"))).as("__kept_pos"))
    df.select(col(idCol).cast(LongType).as("id"),
        col(parasCol).as("paras"))
      .join(keptPos, Seq("id"), "left")
      .select(col("id"),
        coalesce(filter(col("paras"),
            (_, i) => array_contains(col("__kept_pos"), i)),
          typedLit(Seq.empty[String])).as("kept"),
        size(col("paras")).as("n_paras"))
      .withColumn("n_kept", size(col("kept")))
  }

  /** Exact-substring span dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022 — the ExactSubstr
    * policy at word granularity): every k-word span occurring more than
    * once in the corpus keeps only its FIRST occurrence in (id, pos)
    * order; all other occurrences have their k word positions removed,
    * and each document is rebuilt from its surviving words. Overlapping
    * duplicated spans remove the UNION of their positions. Documents
    * shorter than k words have no spans and pass through whole.
    *
    * Input: (idCol integral, textCol string; whitespace tokens). Output:
    * (id, kept_text, n_words, n_removed). Span identity is xxhash64 of
    * the space-joined k words — the same accepted 64-bit collision risk
    * as [[exact]].
    *
    * Scale shape (the dedupParagraphs discipline at span granularity):
    * the shingle explode is row-local (fused wordShingles kernel) and
    * only (hash, id, pos) triplets shuffle — never the text. Winner
    * selection is one min-struct aggregate, map-side partial, so a
    * boilerplate span repeated 10^9 times reduces per-partition without
    * a hot key. Loser SPAN STARTS shuffle as (id, int) pairs — one row
    * per loser span, not per covered position — aggregate to a per-doc
    * start set, and expand to the covered-position union row-locally
    * after the aggregate (k× fewer exchanged/buffered rows than
    * shuffling exploded positions); the covered set stays bounded by
    * document length, joins back on the uniform id key, and the
    * word-array rebuild is row-local (array_contains per word —
    * O(words·covered) on document-bounded arrays). */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    require(k >= 2, s"dedupSpans: span length k must be >= 2, got $k")
    val grams = df
      .select(col(idCol).cast(LongType).as("id"),
        // the kernel emits one whole-doc shingle for docs shorter than
        // k; spans are defined only at full length, so guard those out
        posexplode(when(
          size(TextAnalysis.tokens(col(textCol))) >= k,
          Functional.wordShingles(col(textCol), k))
          .otherwise(typedLit(Seq.empty[String])))
          .as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), xxhash64(col("gram")).as("gh"))
    val winners = grams.groupBy("gh")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
      .select(col("gh"), col("w.id").as("wid"), col("w.pos").as("wpos"))
    val covered = grams.join(winners, Seq("gh"))
      .where(!(col("id") === col("wid") && col("pos") === col("wpos")))
      // Round 22 (guide §2.3, shuffle fewer bytes): aggregate the span
      // START positions and expand each start to its k covered
      // positions AFTER the aggregate, row-locally — the exchange and
      // the aggregate buffer carry one int per loser span instead of k
      // (k=8 in the gates). distinct-start union ∘ expand ≡ expand ∘
      // position union: both compute ⋃ [pos, pos+k-1] over loser spans;
      // sorted-distinct is restored by array_distinct + sort_array, so
      // __covered is element-identical to the old
      // sort_array(collect_set(cp)) form (DedupSpec pins this).
      .groupBy("id")
      .agg(collect_set(col("pos")).as("__starts"))
      .select(col("id"),
        sort_array(array_distinct(flatten(transform(col("__starts"),
          s => sequence(s, s + (k - 1)))))).as("__covered"))
    df.select(col(idCol).cast(LongType).as("id"),
        TextAnalysis.tokens(col(textCol)).as("words"))
      .join(covered, Seq("id"), "left")
      .select(col("id"),
        concat_ws(" ", filter(col("words"), (_, i) =>
          !coalesce(array_contains(col("__covered"), i), lit(false))))
          .as("kept_text"),
        size(col("words")).as("n_words"),
        coalesce(size(col("__covered")), lit(0)).as("n_removed"))
  }

  /** Exact duplicate groups: fingerprint → ids, for groups of size>1. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(Functional.fingerprint64(col(textCol)).as("fp"),
        col(idCol).as("id"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), min("id").as("keep_id"))
      .where(col("n") > 1)

  /** MinHash + LSH candidate pairs.
    *
    * doc → word-shingles → k-minhash signature (single-pass kernel) →
    * `bands` band-hashes → explode → shuffle on (band, bandHash) →
    * within-bucket pairs (a<b). Estimated Jaccard = matching minhash
    * positions / k, computed on the joined signatures; pairs below
    * `threshold` are dropped. 100 TB path: the only shuffled payload is
    * (long bandHash, id, signature), ~1 KB/doc.
    */
  /** (id, sig, band, bandHash) rows — the shared signature/banding
    * front end of [[minHashLsh]] and [[minHashStoreCandidates]]: ONE
    * definition of the minhash, the band slicing, and the band-hash
    * seeding, so the batch self-join and the incremental store join
    * can never drift. Stateless and row-local (kernel + generator),
    * hence legal under Structured Streaming. */
  private def bandedMinhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      bands: Int,
      shingleSize: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = df.select(
      col(idCol).as("id"),
      Functional.minhashText(col(textCol), shingleSize, k).as("sig"))
    // band hash = xxhash64 over the band's slice of the signature
    sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandHash")
  }

  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 5,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val banded = bandedMinhash(df, textCol, idCol, k, bands, shingleSize)

    // bucket join on (band, bandHash); a<b kills self+mirror pairs.
    // Cap pathological buckets to bound the quadratic step.
    val cap = Skew.capGroups(banded, Seq("band", "bandHash"),
      Seq(col("id")), maxBucket)
    val capped = cap.kept
    val l = capped.select(col("band"), col("bandHash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = capped.select(col("band"), col("bandHash"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    // estimated jaccard = fraction of equal signature positions
    // (fused kernel — one pass per pair, no HOF intermediate arrays)
    val est = l.join(r, Seq("band", "bandHash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functional.sigMatchRatio(col("sig_a"), col("sig_b"))
          .as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
    cap.attachDroppedRows(est)
  }

  /** Incremental near-dup candidates of FRESH documents against the
    * signature STORE of everything already ingested — the minhash
    * complement of the exact-fingerprint incremental ingest (q135):
    * new shards land, only their signatures probe the store, and the
    * historical corpus is never re-scanned, never re-shuffled, and
    * never holds text (the store is (band, bandHash, id, sig) rows,
    * ~1 KB/doc, the same payload minHashLsh shuffles).
    *
    * STREAM-LEGAL by construction: every fresh-side op is stateless
    * and row-local (minhash kernel, band generator, stream-static
    * inner join against the store, match-ratio filter) — `fresh` may
    * be a `readStream` frame in append mode with no watermark and no
    * state store. The store side is static and bucket-capped at BUILD
    * time ([[Skew.capGroups]]), which is also the scale knob: the cap
    * bounds the join fan-out PER FRESH ROW, so one pathological
    * band bucket cannot amplify an incoming shard.
    *
    * Emits (id_a = store id, id_b = fresh id, est_jaccard) rows
    * possibly repeated per matching band — pair dedup (groupBy max)
    * is the caller's batch step or the sink's merge, because a
    * blind streaming aggregate would need a watermark the ingest
    * contract doesn't have. Rows below `threshold` are dropped. */
  def minHashStoreCandidates(
      store: DataFrame,
      fresh: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 5,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val storeBanded = Skew.capGroups(
      bandedMinhash(store, textCol, idCol, k, bands, shingleSize),
      Seq("band", "bandHash"), Seq(col("id")), maxBucket).kept
      .select(col("band"), col("bandHash"),
        col("id").as("id_a"), col("sig").as("sig_a"))
    val freshBanded =
      bandedMinhash(fresh, textCol, idCol, k, bands, shingleSize)
        .select(col("band"), col("bandHash"),
          col("id").as("id_b"), col("sig").as("sig_b"))
    freshBanded.join(storeBanded, Seq("band", "bandHash"))
      // a document present on BOTH sides (the natural state right
      // after a sink merges a fresh shard into the store) must not
      // emit a self-pair at est 1.0 per band — row-local, stream-legal
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functional.sigMatchRatio(col("sig_a"), col("sig_b"))
          .as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit
    * chunks (any pair at Hamming distance ≤ 3 shares at least one
    * chunk); verify with exact Hamming distance. */
  def simHash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"),
        Functional.simhash64(TextAnalysis.tokens(col(textCol))).as("sh")),
      "id", "sh", maxHamming, maxBucket)

  /** Banded Hamming near-dup join over ANY 64-bit signature column
    * (simhash, image dHash, audio fingerprint): band into 4×16-bit
    * chunks, bucket-join within chunks under [[Skew.capGroups]],
    * verify with exact Hamming. LOSSLESS for maxHamming ≤ 3 — by
    * pigeonhole, a pair within distance 3 shares at least one
    * untouched chunk (q290 oracles pair-set equality against exact
    * all-pairs on that promise); beyond 3 it degrades to a recall<1
    * LSH-style candidate generator (the contract q41's planted
    * self-check covers). Emits (id_a, id_b, hamming,
    * dropped_candidates). Never all-pairs: the shuffle carries
    * (chunk, chunkVal, id, sh) rows, 4 per signature, at any corpus
    * size. */
  /** (id, sh, chunk, chunkVal) rows — the 4×16-bit banding shared by
    * [[hammingPairs]] and [[hammingStoreCandidates]]. Stateless and
    * row-local (a generator over shift/mask expressions), hence legal
    * under Structured Streaming. */
  private def chunked(sig0: DataFrame, idCol: String, sigCol: String)
      : DataFrame =
    sig0.select(col(idCol).as("id"), col(sigCol).as("sh"))
      .select(col("id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), i * 16)
            .bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunkVal")

  def hammingPairs(
      sig0: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val chunks = chunked(sig0, idCol, sigCol)
    val cap = Skew.capGroups(chunks, Seq("chunk", "chunkVal"),
      Seq(col("id")), maxBucket)
    val capped = cap.kept
    val l = capped.select(col("chunk"), col("chunkVal"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = capped.select(col("chunk"), col("chunkVal"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val pairs = l.join(r, Seq("chunk", "chunkVal"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functional.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
    cap.attachDroppedRows(pairs)
  }

  /** Incremental Hamming near-dup candidates of FRESH signatures
    * against a historical signature STORE — [[minHashStoreCandidates]]
    * for the 64-bit-signature modalities (simhash text, image dHash,
    * audio fingerprints). STREAM-LEGAL on the fresh side (banding is a
    * stateless generator, the join is stream-static, the Hamming
    * verify is row-local); the store is banded and bucket-capped at
    * build time, bounding fan-out per incoming row. Unlike the minhash
    * variant this family is fully ORACLE-ABLE when the signature is
    * (q289/q293's arithmetic-restatable fingerprints): q295 certifies
    * stream == batch == DuckDB on the same corpus. Emits (id_a =
    * store id, id_b = fresh id, hamming ≤ maxHamming), possibly
    * repeated per matching chunk — dedup is `distinct` downstream (the
    * hamming value is chunk-independent). */
  def hammingStoreCandidates(
      store: DataFrame,
      fresh: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val storeBanded = Skew.capGroups(chunked(store, idCol, sigCol),
      Seq("chunk", "chunkVal"), Seq(col("id")), maxBucket).kept
      .select(col("chunk"), col("chunkVal"),
        col("id").as("id_a"), col("sh").as("sh_a"))
    val freshBanded = chunked(fresh, idCol, sigCol)
      .select(col("chunk"), col("chunkVal"),
        col("id").as("id_b"), col("sh").as("sh_b"))
    freshBanded.join(storeBanded, Seq("chunk", "chunkVal"))
      // exclude store/fresh self-pairs (see minHashStoreCandidates)
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functional.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for a candidate pair set
    * (columns id_a, id_b): joins token-shingle SETS back and computes
    * |∩|/|∪| with array built-ins. Use after an LSH pass — never
    * all-pairs. */
  def ngramJaccard(
      candidates: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3): DataFrame = {
    // hashed shingle sets (sorted array<long>): exact Jaccard up to
    // 64-bit hash collisions, no shingle-string materialization
    val sets = df.select(col(idCol).as("__jid"),
      Functional.shingleSet(col(textCol), n).as("__set"))
    candidates
      .join(sets.withColumnsRenamed(
        Map("__jid" -> "id_a", "__set" -> "set_a")), Seq("id_a"))
      .join(sets.withColumnsRenamed(
        Map("__jid" -> "id_b", "__set" -> "set_b")), Seq("id_b"))
      .withColumn("jaccard",
        Functional.jaccardSorted(col("set_a"), col("set_b")))
      .drop("set_a", "set_b")
  }

  /** Winnowing partial-overlap candidates (the MOSS pattern over
    * [[graft.functions.Kernels#winnow]]): docs sharing any byte run of
    * length >= w + k - 1 share a selected fingerprint BY CONSTRUCTION —
    * an analytic guarantee, not probabilistic banding — so a plain
    * fingerprint-join surfaces partial overlap (shared boilerplate,
    * quoted passages, identical docs) that whole-document hashing and
    * token-set similarity can miss. Shuffled payload is (fingerprint,
    * id): the winnow set is ~2/(w+1) of the k-grams, never the text.
    * `minShared` drops weak single-collision pairs; `maxBucket` caps
    * viral fingerprints (boilerplate shared by thousands of docs) with
    * the same dropped_candidates accounting as the LSH variants.
    *
    * Pick `k` for the phrase length that MEANS overlap: on natural
    * text, k=8 (~1.5 words) pairs everything through chance word
    * sequences; k=24 (~4 words) isolates genuinely shared passages
    * (measured on the synthetic docs table: 54k pairs vs 28 at n=500,
    * converging to the exact near-dup set). */
  def winnowOverlap(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 24,
      w: Int = 16,
      minShared: Int = 2,
      maxBucket: Int = 1000): DataFrame =
    fingerprintOverlap(
      df.select(col(idCol).as("id"),
        explode(Functional.winnow(col(textCol), k, w)).as("fp")),
      // winnow returns a sorted DISTINCT set per document, so the
      // input-dedup shuffle would be pure waste here
      "id", "fp", minShared, maxBucket, dedupInput = false)

  /** Pairs of ids sharing at least `minShared` DISTINCT fingerprints —
    * the generic shared-fingerprint join behind [[winnowOverlap]]
    * (winnow sets) and the video frame-hash overlap (q297): shuffles
    * (fp, id) pairs only, caps pathological fingerprints (the
    * all-black-frame / boilerplate-header case) with exact drop
    * accounting. Input rows are (id, fp); with `dedupInput` (the
    * default) repeated fps per id are deduped first so a frame
    * repeated inside ONE video can't inflate the pair's shared count
    * — pass false only when the producer guarantees distinctness. */
  def fingerprintOverlap(
      fps0: DataFrame,
      idCol: String,
      fpCol: String,
      minShared: Int = 2,
      maxBucket: Int = 1000,
      dedupInput: Boolean = true): DataFrame = {
    val raw = fps0.select(col(idCol).as("id"), col(fpCol).as("fp"))
    val fps = if (dedupInput) raw.distinct() else raw
    val cap = Skew.capGroups(fps, Seq("fp"), Seq(col("id")), maxBucket)
    val capped = cap.kept
    val l = capped.select(col("fp"), col("id").as("id_a"))
    val r = capped.select(col("fp"), col("id").as("id_b"))
    val pairs = l.join(r, Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
    cap.attachDroppedRows(pairs)
  }

  /** Incremental shared-fingerprint candidates of FRESH fingerprint
    * rows against a static STORE — [[fingerprintOverlap]]'s streaming
    * face, completing the store-candidate family
    * ([[minHashStoreCandidates]], [[hammingStoreCandidates]]) for the
    * SET-signature modalities (video frame hashes, winnow sets). The
    * store's fps are distinct-reduced and bucket-capped at BUILD time
    * (bounding fan-out per incoming row); the fresh side stays
    * row-local/stateless, so the append plan is watermark-free. Emits
    * (id_a = store id, id_b = fresh id, fp) once per shared capped
    * fingerprint — the shared-count aggregation (groupBy
    * countDistinct >= minShared) is the sink's merge step, exactly
    * like the minhash variant's pair-dedup. q301 certifies
    * stream == batch == DuckDB over re-derived frame hashes. */
  def fingerprintStoreCandidates(
      store: DataFrame,
      fresh: DataFrame,
      idCol: String,
      fpCol: String,
      maxBucket: Int = 1000): DataFrame = {
    val st = Skew.capGroups(
      store.select(col(idCol).as("id"), col(fpCol).as("fp")).distinct(),
      Seq("fp"), Seq(col("id")), maxBucket).kept
      .select(col("fp"), col("id").as("id_a"))
    fresh.select(col(idCol).as("id_b"), col(fpCol).as("fp"))
      .join(st, Seq("fp"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp"))
  }

  /** SEQUENCE-aware near-dup over per-item fingerprint SEQUENCES
    * (video frame hashes with their frame index): for every pair
    * sharing at least one fingerprint, the count of distinct shared
    * fingerprints AND the longest ALIGNED CONTIGUOUS RUN — matches at
    * a common index offset with consecutive positions (the
    * gaps-and-islands construction). Set overlap alone cannot tell a
    * reordered cut (every frame shared, no run) from a temporal clone
    * (the same frames in the same order); `lcr` does: a shuffled copy
    * scores shared_fps = n, lcr = 1, a true clone lcr = n.
    *
    * Scale shape: the fp-join shuffles (fp, id, idx) rows under
    * [[Skew.capGroups]] (viral frames capped with exact drop
    * accounting, never all-pairs); the run window partitions by
    * (pair, offset), so its state is bounded by the smaller sequence
    * length — thousands of frames, never corpus-sized. Input rows are
    * (id, idx, fp); one fp per (id, idx). */
  def frameRunOverlap(
      frames: DataFrame,
      idCol: String,
      idxCol: String,
      fpCol: String,
      minShared: Int = 1,
      maxBucket: Int = 1000): DataFrame = {
    val f = frames.select(col(idCol).as("id"), col(idxCol).as("idx"),
      col(fpCol).as("fp"))
    val cap = Skew.capGroups(f, Seq("fp"), Seq(col("id"), col("idx")),
      maxBucket)
    val l = cap.kept.select(col("fp"), col("id").as("id_a"),
      col("idx").as("idx_a"))
    val r = cap.kept.select(col("fp"), col("id").as("id_b"),
      col("idx").as("idx_b"))
    // one row per aligned match; a frame repeated WITHIN one video
    // yields multiple (idx_a, idx_b) alignments, each its own offset
    val matches = l.join(r, Seq("fp"))
      .where(col("id_a") < col("id_b"))
    cap.attachDroppedRows(frameRunStats(matches, minShared))
  }

  /** The gaps-and-islands tail of the sequence family — (id_a, id_b,
    * shared_fps, lcr) from aligned-match rows (fp, id_a, id_b, idx_a,
    * idx_b). ONE implementation shared by [[frameRunOverlap]] and the
    * streaming sink merge over [[frameRunStoreCandidates]] (q305), so
    * batch and incremental runs cannot drift. */
  def frameRunStats(matches0: DataFrame, minShared: Int = 1)
      : DataFrame = {
    // ONE pair-keyed exchange for the whole tail (round-21, guide
    // §2.4): hash-partition by (id_a, id_b) once — the duplicate
    // elimination, the (pair, offset) run window, both pair-level
    // aggregates, and the final shared×lcr join all have clustering
    // keys that SUPERSET the pair, so HashPartitioning(id_a, id_b)
    // satisfies every downstream distribution and no further shuffle
    // is inserted (previously: distinct exchanged on all six columns,
    // the window re-exchanged on (pair, off), and each aggregate
    // exchanged again on the pair — four exchanges of the match set).
    // The two branches reuse the one exchange (same subtree).
    val matches = matches0
      .select(col("fp"), col("id_a"), col("id_b"), col("idx_a"),
        col("idx_b"), (col("idx_a") - col("idx_b")).as("off"))
      .repartition(col("id_a"), col("id_b"))
      .dropDuplicates()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"), col("off"))
      .orderBy(col("idx_a"))
    val runs = matches
      .withColumn("isl", col("idx_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("off"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("run")).as("lcr"))
    val shared = matches
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("fp")).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
    // both aggregates derive from ONE `matches` plan — rename the run
    // side's keys so the self-join cannot produce conflicting
    // attribute ids (hit when the source is a streaming memory sink)
    val runsR = runs.select(col("id_a").as("__run_a"),
      col("id_b").as("__run_b"), col("lcr"))
    shared.join(runsR,
        col("id_a") === col("__run_a") && col("id_b") === col("__run_b"))
      .drop("__run_a", "__run_b")
  }

  /** Incremental SEQUENCE-aware candidates of fresh (id, idx, fp)
    * frame rows against a static store — [[fingerprintStoreCandidates]]
    * carrying the frame INDEXES through, so the sink's merge step
    * ([[frameRunStats]]) can compute aligned contiguous runs as well
    * as shared counts. Store distinct-reduced and bucket-capped at
    * build; fresh side row-local/stateless (watermark-free append);
    * self-pairs excluded. Emits (id_a, id_b, fp, idx_a, idx_b). */
  def frameRunStoreCandidates(
      store: DataFrame,
      fresh: DataFrame,
      idCol: String,
      idxCol: String,
      fpCol: String,
      maxBucket: Int = 1000): DataFrame = {
    val st = Skew.capGroups(
      store.select(col(idCol).as("id"), col(idxCol).as("idx"),
        col(fpCol).as("fp")).distinct(),
      Seq("fp"), Seq(col("id"), col("idx")), maxBucket).kept
      .select(col("fp"), col("id").as("id_a"), col("idx").as("idx_a"))
    fresh.select(col(idCol).as("id_b"), col(idxCol).as("idx_b"),
        col(fpCol).as("fp"))
      .join(st, Seq("fp"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp"), col("idx_a"),
        col("idx_b"))
  }

  /** Benchmark decontamination (the GPT-3 Appendix C / Gopher
    * eval-overlap pattern): flag every training document sharing at
    * least one word n-gram with the evaluation set. Returns
    * (idCol, n_hits) where n_hits counts the DISTINCT contaminating
    * n-grams, so downstream policy can drop outright or threshold.
    *
    * Scale shape: benchmark suites are MBs while the corpus is TBs, so
    * the eval n-gram set is distinct-reduced and BROADCAST — the corpus
    * side is a single scan + map-side hash probe + one aggregation on
    * (id, gram-hash); the corpus text never shuffles. Grams are
    * compared as xxhash64 of the joined shingle (collision odds ~1e-12
    * at benchmark-set cardinalities). Real pipelines use n of 8-13;
    * docs shorter than n contribute their full token run as one gram
    * (TextAnalysis.shingles semantics). */
  def decontaminate(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13): DataFrame = {
    def grams(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as("__did"),
          explode(TextAnalysis.shingles(col(textCol), n)).as("__g"))
        .select(col("__did"), xxhash64(col("__g")).as(out))
    val evGrams = grams(evalSet, "__eg").select("__eg").distinct()
    grams(train, "__tg")
      .join(broadcast(evGrams), col("__tg") === col("__eg"))
      .groupBy(col("__did").as(idCol))
      .agg(count_distinct(col("__tg")).as("n_hits"))
  }

  /** Duplicate-group resolution: connected components over a candidate
    * pair set (columns id_a, id_b — the output shape of every pair
    * generator above). Returns (id, component) where component is the
    * minimum id reachable from `id` — so `component` doubles as the
    * deterministic keep-id, completing the near-dup pipeline:
    * pairs → groups → keep one doc per group.
    *
    * Algorithm: alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) —
    * large-star hangs every larger neighbor off its center's
    * neighborhood minimum, small-star re-points the smaller neighbors,
    * and the edge set contracts toward a star per component in
    * O(log² n) rounds REGARDLESS of diameter (a 10k-node path converges
    * in ~15 rounds where min-label propagation needs 10k — pinned in
    * TextPipelineSpec). Each round is two groupBy-min + two joins on
    * the pair graph only, never the corpus; the driver-side loop is
    * control flow, per-round `localCheckpoint` truncates lineage, and
    * convergence is a (count, hash-sum) fingerprint comparison — one
    * bounded aggregate, never a collect. `maxIter` is a hard stop;
    * hitting it raises rather than silently emitting partial
    * components. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(pairs, maxIter)._1

  /** [[connectedComponents]] + the number of star rounds it took —
    * package-visible so specs can pin the O(log² n) convergence. */
  private[graft] def connectedComponentsWithStats(
      pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    // canonical undirected edges (a < b), self-loops dropped
    // NOTE (round 21): a lazy localCheckpoint(eager = false) here and
    // in the loop (letting the fingerprint action materialize the
    // checkpoint, halving the job count per star round) was tried and
    // MEASURED SLOWER on every CC consumer (q88/q94/q96/q263/q282
    // +25-40% in an A/B subset pair) — the eager form stays.
    // Cluster caveat (SCALE.md "localCheckpoint and executor loss"):
    // executor-local checkpoint blocks don't survive executor loss; an
    // iterative fixpoint on preemptible capacity should use reliable
    // checkpoint() on distributed storage instead.
    var edges = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()

    def sym(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))

    /** (row count, xxhash64 content sum) — the cheap fixpoint
      * fingerprint (one scan; a collision would need two DIFFERENT
      * same-size edge sets in the same run to collide on a 128-bit-wide
      * decimal sum while also both being star-fixpoints of the same
      * graph). DECIMAL(38,0) so the sum cannot overflow under ANSI. */
    def fingerprint(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b"))
          .cast(DecimalType(38, 0))), lit(0L).cast(DecimalType(38, 0))))
        .head()
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }

    var fp = fingerprint(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: center u, m = min(Γ(u) ∪ {u}); edge (m, v) per v > u
      val s = sym(edges)
      val mins = s.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = s.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
      // small-star: center u over smaller neighbors N⁻, m = min(N⁻);
      // edges (m, v) for v ∈ N⁻ \ {m} plus (m, u)
      val smaller = sym(large).where(col("v") < col("u"))
      val minsS = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
      val joined = smaller.join(minsS, "u")
      val next = joined.where(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionByName(minsS.select(col("m").as("a"), col("u").as("b")))
        .distinct()
        .localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      iter += 1
    }
    if (!converged && iter >= maxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds")
    // at the star fixpoint every node's min neighbor (or itself) IS the
    // component minimum
    val starLabels = sym(edges)
      .groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("component"))
      .select(col("u").as("id"), col("component"))
    // a node whose only edges were self-loops vanished with the a=!=b
    // canonicalization filter — the contract is a label row for EVERY
    // id in the pair graph (resolveKeepBest would otherwise silently
    // drop such documents from the keep/drop decision), so restore
    // them as their own singleton component. Pair-graph-sized distinct
    // + left join, never corpus-sized.
    val nodes = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .distinct()
    val labels = nodes.join(starLabels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    (labels, iter)
  }

  /** Within-bucket cosine pairs (a<b, exact cosine ≥ threshold) with
    * the standard cap + dropped_candidates accounting — the shared tail
    * of [[embeddingCosine]] and [[semantic]], public so callers that
    * already hold a bucketed signature frame (id, v, bucket) — e.g. a
    * reused [[Clustering]] assignment — can generate pairs without
    * refitting. */
  def cosinePairsWithin(
      sig: DataFrame, threshold: Double, maxBucket: Int): DataFrame = {
    val cap = Skew.capGroups(sig, Seq("bucket"), Seq(col("id")), maxBucket)
    val capped = cap.kept
    val l = capped.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = capped.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val pairs = l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functional.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy("id_a", "id_b").agg(max("cosine").as("cosine"))
    cap.attachDroppedRows(pairs)
  }

  /** Keep-one-per-group resolution with a QUALITY policy: resolve
    * `pairs` into connected components ([[connectedComponents]]), then
    * keep the highest-`score` member of each group (ties → lowest id).
    * `scores` carries (id, score); ids missing from it are never
    * keepers unless their WHOLE component is unscored, in which case
    * the min-id member keeps (the [[connectedComponents]] default).
    * Returns (id, component, keep_id) for every id in the pair graph;
    * ids outside any pair are implicitly their own keeper. The min-id
    * default of
    * [[connectedComponents]] is the right tie-break but the wrong
    * POLICY for a training corpus — given a boilerplate cluster you
    * keep the longest / highest-quality copy, not the one with the
    * smallest id.
    *
    * Scale: one extra join + one aggregation over the component frame
    * (pair-graph-sized, not corpus-sized). The keeper argmax is a
    * single `min(struct(-score, id))` aggregate — map-side partial,
    * no per-group sort. */
  def resolveKeepBest(pairs: DataFrame, scores: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    // left join: unscored ids stay in the output (min skips their null
    // struct); a fully-unscored component falls back to its min id —
    // which IS the component label — via the coalesce.
    val keepers = comp.join(scores, Seq("id"), "left")
      .groupBy("component")
      .agg(min(when(col("score").isNotNull,
          struct((col("score") * -1).as("s"), col("id").as("i"))))
        .as("__k"))
      .select(col("component"),
        coalesce(col("__k.i"), col("component")).as("keep_id"))
    comp.join(keepers, "component").select("id", "component", "keep_id")
  }

  /** Embedding near-dup pairs: hyperplane-LSH bucket, within-bucket
    * cosine ≥ threshold. */
  def embeddingCosine(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      bits: Int = 12,
      maxBucket: Int = 2000): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Functional.hyperplaneLsh(col(vecCol), bits).as("bucket"))
    cosinePairsWithin(sig, threshold, maxBucket)
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): k-means-cluster the
    * embeddings ([[Clustering]], full-data spherical Lloyd), then find
    * cosine-similar pairs WITHIN each cluster. Versus [[embeddingCosine]]
    * (random hyperplane buckets), the buckets here adapt to the data
    * density — semantically near docs land in the same cell with far
    * fewer buckets — and the cluster assignment is itself a reusable
    * pipeline artifact (mixture balancing, per-cluster sampling, the
    * IVF layout key at rest). Identical vectors always share a cell
    * (assignment is a deterministic function of the vector), so exact
    * duplicates can never be split across buckets — the same analytic
    * recall floor the LSH variants only get probabilistically.
    *
    * Scale: `nCells` Lloyd iterations are scans (see [[Clustering]]);
    * the quadratic step is confined to cells with the usual
    * `maxBucket` cap + `dropped_candidates` accounting. A production
    * SemDeDup sizes nCells so cells fit comfortably under the cap
    * (paper uses ~100k cells for LAION-scale). */
  def semantic(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int = 16,
      threshold: Double = 0.95,
      iters: Int = 5,
      maxBucket: Int = 2000): DataFrame = {
    val cents = Clustering.fit(df, vecCol, idCol, nCells, iters)
    val dim = cents.length / nCells
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Clustering.assignment(col(vecCol), cents, dim).as("bucket"))
    cosinePairsWithin(sig, threshold, maxBucket)
  }
}
