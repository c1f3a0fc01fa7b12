package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical retrieval over a document corpus: Okapi BM25 scoring with
  * bounded top-k selection — the data-selection / decontamination-probe
  * face of the text-analysis suite (TF-IDF ranks a document's own
  * terms; BM25 ranks DOCUMENTS against a query set, the primitive
  * behind "pull the k most relevant training docs per eval prompt" and
  * importance-style corpus triage).
  *
  * Scale shape: the corpus text is scanned ONCE into (doc, term, tf)
  * postings — one shuffle on (doc, term); the document-frequency table
  * is VOCABULARY-sized and the query-term table is query-sized (both
  * broadcast); per-document length joins on the doc key; the final
  * per-query selection is [[GroupTopK]]'s partial-merging k-heap, so
  * only k·|queries| rows survive each task — never a
  * `row_number().over(partitionBy(query))` window, which would shuffle
  * every scored row into |queries| partitions (maximally skewed when
  * queries are few, the common case).
  *
  * Determinism / oracle portability: every per-term score is the SAME
  * IEEE double expression over exact integers (tf, df, N, dl) plus one
  * shared avgdl double on both engines (constants fold in double on
  * both sides — ln() cross-engine bit-equality is the q87/q89
  * precedent), then mediated through DECIMAL(20,12) BEFORE the
  * per-document sum, so the total is independent of partition order
  * (double summation would be association-sensitive). Ties break by
  * doc id ascending.
  *
  * Reference analog: none — torcharrow stops at per-column text ops;
  * retrieval is part of the training-data extension surface.
  */
object Retrieval {

  /** The full BM25-scored set — every (query, document) pair sharing
    * at least one term, with the exact ×10¹² integer score witness —
    * BEFORE any top-k selection. The building block behind
    * [[bm25TopK]] and the hard-negative miner (which must select from
    * the whole scored band, not a fixed-depth prefix). Same scale
    * shape as the top-k form minus the heap: output is
    * matching-pairs-sized. */
  def bm25Scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25Scores: empty query set")
    val spark = docs.sparkSession
    import spark.implicits._

    val qtermSeq = queries
      .flatMap { case (qid, q) =>
        q.trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
    require(qtermSeq.nonEmpty,
      "bm25Scores: no query terms after tokenizing")
    val qterms = qtermSeq.toDF("qid", "term")

    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // Round-21 (guide §2.3, shuffle fewer bytes): the old plan built
    // corpus-wide (doc, term) postings — the widest exchange here — and
    // only then filtered to query terms. Restructured so nothing
    // corpus-sized is ever shuffled:
    //  - dl (doc length) is a pure PROJECTION, size(tokens(text)) — no
    //    aggregate, no exchange (a doc with zero/null tokens never
    //    reaches tf, and null dl is skipped by sum, so `tot` and every
    //    join row are unchanged);
    //  - the broadcast query-term filter moves BELOW the tf aggregate:
    //    non-query-term tokens never reach an exchange;
    //  - df over the filtered postings equals the corpus df for every
    //    query term (tf still covers EVERY doc containing the term).
    // Same (doc, query-term) rows, same tf/df/dl/N/avgdl values,
    // identical scores.
    // CONTRACT: idCol is unique per document (every in-repo caller
    // passes a primary-key doc_id). dl as a projection relies on it —
    // a duplicated id would fan out the tf join rows where the old
    // groupBy(idCol) dl collapsed them (and tf/N would already be
    // ill-defined for duplicates anyway: tf merges the copies' counts).
    val dl = docs.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast(LongType).as("dl"))
    val qtermSet = qtermSeq.map(_._2).distinct.toDF("term")
    val qtok = tok.join(broadcast(qtermSet), "term")
    val tf = qtok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col(idCol)).as("n"))
    val tot = dl.agg(sum(col("dl")).as("tot"))

    def d(c: Column): Column = c.cast(DoubleType)
    val avgdl = d(col("tot")) / d(col("n"))
    val idf = log(lit(1.0) +
      (d(col("n")) - d(col("df")) + lit(0.5)) / (d(col("df")) + lit(0.5)))
    val tfn = (d(col("tf")) * (lit(k1) + lit(1.0))) /
      (d(col("tf")) + lit(k1) *
        ((lit(1.0) - lit(b)) + lit(b) * (d(col("dl")) / col("avgdl"))))

    tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(tot))
      .withColumn("avgdl", avgdl)
      .withColumn("s", (idf * tfn).cast(DecimalType(20, 12)))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("s")).cast(DecimalType(20, 12)).as("score"))
      // exact: score has 12 decimals, so score·10¹² is integral; the
      // max per-term score is ~ln(N)·(k1+1), far inside LONG at 10¹²
      .withColumn("score_units",
        (col("score") * lit(java.math.BigDecimal.TEN.pow(12)))
          .cast(LongType))
  }

  /** BM25 top-`k` documents per query. `queries` is a bounded in-memory
    * query set (qid, text) — queries are the SMALL side by contract
    * (they broadcast); the corpus side is the DataFrame. Query terms
    * are whitespace-tokenized and deduplicated per query (standard
    * BM25 treats the query as a term SET; repeat a term via a custom
    * weight upstream if query-side tf matters). Documents sharing no
    * query term score nothing and never leave the scan.
    *
    * Returns (qid, rank, `idCol`, score_units, score) with rank 1..k
    * by (score desc, id asc); `score_units` = score·10¹² as the exact
    * integer witness, `score` the double it round-trips to.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (the Lucene/ATIRE form —
    * always positive, unlike the raw Robertson–Sparck Jones log odds);
    * tf-norm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"bm25TopK: k=$k")
    val scored = bm25Scores(docs, idCol, textCol, queries, k1, b)

    GroupTopK.minKByKey(scored, Seq("qid"), idCol,
        key = -col("score_units"), k)
      .select(col("qid"), col("rank").cast(LongType).as("rank"),
        col("id").as(idCol), (-col("key")).as("score_units"),
        (-col("key")).cast(DoubleType) / lit(1.0e12) as "score")
  }

  /** Reciprocal-rank fusion of up to 7 ranked retrieval lists — the
    * standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher,
    * SIGIR'09: lexical BM25 + dense cosine fused by rank alone, no
    * score calibration across heterogeneous sides). Each side must
    * carry (`qidCol`, `idCol`, `rankCol`) with 1-based ranks over the
    * SAME entity-id space; sides are top-k' lists by contract, so
    * everything downstream of the union is k'·|queries|·|sides|-bounded
    * — the heavy lifting (corpus scans, scoring) stays inside the
    * sides.
    *
    * Exactness: the textbook Σ 1/(c+rank) is a float sum whose value
    * depends on which sides hit — here each contribution is the exact
    * integer `UNIT div (c+rank)` (IntegralDivide — `/` on Columns is
    * DOUBLE division) and the per-row term is packed as `u·8 + 1`, so
    * ONE long sum yields both the fused score (packed div 8) and the
    * coverage count (packed mod 8) with no join-back re-executing the
    * sides. Selection key = packed descending: ties in fused units
    * break by coverage (more sides wins), then id ascending — a pure
    * function of the data, replayable bit-for-bit by an external
    * oracle. Overflow headroom: max packed = 8·|sides|·UNIT/(c+1) + 7
    * ≈ 1.8e12 at 7 sides, c=60 — five decimal orders inside LONG.
    * The cap is 7, not 8: coverage is recovered as packed mod 8, and
    * a full-coverage count of 8 would wrap to 0.
    *
    * Returns (qid, rank, id, rrf_units, sides_hit) with rank 1..k per
    * query via [[GroupTopK]]'s partial-merging heap (window-free).
    * Reference analog: none — retrieval is extension surface. */
  def rrfFuse(
      sides: Seq[DataFrame],
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int,
      c: Long = 60L): DataFrame = {
    require(sides.nonEmpty, "rrfFuse: empty side list")
    require(sides.size <= 7,
      s"rrfFuse: ${sides.size} sides — coverage packs into 3 bits " +
        "(mod 8), so a count of 8 is unrepresentable: max 7")
    require(k > 0, s"rrfFuse: k=$k")
    require(c >= 0, s"rrfFuse: c=$c")
    import org.apache.spark.sql.graftshim.Shim
    def idiv(a: Column, b: Column): Column = Shim.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Shim.expression(a), Shim.expression(b)))
    val UNIT = 1000000000000L // 10^12: the q278 score_units convention
    val unioned = sides.zipWithIndex
      .map { case (df, i) => df.select(
        col(qidCol).cast(LongType).as("qid"),
        col(idCol).cast(LongType).as("id"),
        col(rankCol).cast(LongType).as("rnk"),
        lit(i).as("__side")) }
      .reduce(_ unionByName _)
    // duplicate contract, enforced as loudly as the rank contract: a
    // repeated (qid,id) WITHIN one side would add another u·8+1 term —
    // silently inflating rrf_units and sides_hit (which could exceed
    // the real side count and, past 7 rows for one id, wrap mod 8).
    // Detection is fused into the existing aggregate: within a
    // (qid,id) group, rows == distinct sides iff every side
    // contributed at most once.
    val packed = unioned
      .select(col("qid"), col("id"), col("__side"),
        when(col("rnk").isNull || col("rnk") < 1L, raise_error(lit(
          "rrfFuse: null or < 1 rank — sides must be 1-based top-k " +
            "lists (a NULL would silently drop the side's contribution " +
            "from the fused sum)")))
          .otherwise(idiv(lit(UNIT), lit(c) + col("rnk")) * 8L + 1L)
          .as("pk"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("pk")).cast(LongType).as("__pksum"),
        count(lit(1)).as("__n"),
        countDistinct(col("__side")).as("__nd"))
      .select(col("qid"), col("id"),
        when(col("__n") =!= col("__nd"), raise_error(lit(
          "rrfFuse: duplicate (qid,id) within one side — each side " +
            "must be a deduplicated ranked list (a duplicate would " +
            "silently inflate rrf_units and wrap sides_hit mod 8)")))
          .otherwise(col("__pksum")).cast(LongType).as("packed"))
    GroupTopK.minKByKey(packed, Seq("qid"), "id",
        key = -col("packed"), k)
      .select(col("qid"), col("rank").cast(LongType).as("rank"),
        col("id"),
        idiv(-col("key"), lit(8L)).as("rrf_units"),
        pmod(-col("key"), lit(8L)).as("sides_hit"))
  }

  /** BM25 with pseudo-relevance-feedback query expansion (the RM1/
    * Rocchio second stage): run BM25, treat the top `fbDocs` documents
    * per query as relevant, weight their terms by the relevance-model
    * estimate w(t) = Σ_d tf(t,d)/dl(d) (uniform feedback-doc prior),
    * add the `fbTerms` heaviest terms to the query, and run BM25 again
    * with the expanded term set. The classic fix for vocabulary
    * mismatch — a query about "hash join" pulls in the co-occurring
    * vocabulary of its own best matches.
    *
    * Exactness: each tf/dl is ONE double division of exact integers,
    * mediated through DECIMAL(20,12) before the per-(query, term) sum
    * (partition-order independence, the bm25 convention); expansion
    * terms are picked by the exact ×10¹² integer weight with (weight
    * desc, term asc) tie-break — fully replayable. Expansion that
    * re-selects an original term is a no-op (BM25 treats the query as
    * a term set).
    *
    * Scale shape: two BM25 passes (each one corpus scan) plus one
    * feedback-weight aggregate whose input is the postings of
    * fbDocs·|queries| documents — feedback-sized, not corpus-sized
    * (the feedback broadcast-join happens BEFORE the tf aggregate, so
    * non-feedback tokens never reach an exchange).
    * The per-query expansion pick happens on the driver over the
    * feedback VOCABULARY (bounded by fbDocs documents' distinct terms
    * by construction) — the mixToTarget driver-bound discipline. */
  def bm25PrfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int,
      fbDocs: Int = 5,
      fbTerms: Int = 3,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(fbDocs > 0, s"bm25PrfTopK: fbDocs=$fbDocs")
    require(fbTerms > 0, s"bm25PrfTopK: fbTerms=$fbTerms")
    val UNIT = java.math.BigDecimal.TEN.pow(12)
    val first = bm25TopK(docs, idCol, textCol, queries, fbDocs, k1, b)
      .select(col("qid"), col(idCol))
    // broadcast-join the feedback set BEFORE aggregating: a join does
    // not push below a groupBy, so aggregating first would shuffle the
    // whole corpus's (doc, term) postings — only feedback-doc tokens
    // may reach the exchange (per-(qid, doc) tf/dl equal the per-doc
    // values, so the weights are unchanged)
    val fbTok = docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .join(broadcast(first), idCol)
    val fbTf = fbTok.groupBy(col("qid"), col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val fbDl = fbTf.groupBy(col("qid"), col(idCol))
      .agg(sum(col("tf")).as("dl"))
    def d(c: Column): Column = c.cast(DoubleType)
    val wts = fbTf.join(fbDl, Seq("qid", idCol))
      .select(col("qid"), col("term"),
        (d(col("tf")) / d(col("dl"))).cast(DecimalType(20, 12)).as("w"))
      .groupBy(col("qid"), col("term"))
      .agg((sum(col("w")) * lit(UNIT)).cast(LongType).as("wu"))
      .collect()
    val topTerms = wts.map(r => (r.getLong(0), r.getString(1),
        r.getLong(2)))
      .groupBy(_._1).map { case (qid, ts) =>
        qid -> ts.sortBy { case (_, t, u) => (-u, t) }
          .take(fbTerms).map(_._2).toSeq
      }
    val expanded = queries.map { case (qid, q) =>
      qid -> (q.trim.split("\\s+").filter(_.nonEmpty).toSeq ++
        topTerms.getOrElse(qid, Seq.empty)).mkString(" ")
    }
    bm25TopK(docs, idCol, textCol, expanded, k, k1, b)
  }

  /** Judged evaluation of a retrieval run at cutoff `k`: per query,
    * nDCG@k, MRR@k, precision@k, recall@k — the numbers that decide
    * whether a data-selection retriever is good enough to curate with.
    *
    * `ranked` carries (`qid`, `id`, `rank`) with 1-based ranks (any
    * retriever output — BM25, ANN, fused); `rel` carries (`qid`, `id`,
    * `grade`) with integer grades 1..30 (filter grade-0 rows upstream;
    * 30 caps 2^grade inside INT before the LONG cast). Relevance sets
    * are judgment-sized by nature, but nothing here assumes a bound:
    * the ideal ranking per query is [[GroupTopK]]'s k-heap over `rel`
    * (key = grade desc, id asc — deterministic), never a per-query
    * window.
    *
    * Exactness/oracle portability: DCG uses the natural-log discount —
    * dcg@k = Σ_{hits at r ≤ k} (2^grade − 1) / ln(r + 1) — so both
    * engines evaluate the IDENTICAL IEEE chain (ln bit-equality is the
    * q87/q89 precedent; log2 implementations differ). Each term passes
    * through DECIMAL(20,12) BEFORE the per-query sum (q278 convention:
    * partition-order independence), and every published ratio is ONE
    * double division of exact integers: ndcg = dcg_units/idcg_units,
    * mrr_units = 10¹² div first-relevant-rank (pure integer),
    * precision = hits/k, recall = hits/rel_total. idcg_units = 0 is
    * impossible by contract (every rel row has grade ≥ 1), so a zero
    * raises rather than letting x/0 diverge cross-engine (NaN/Inf in
    * Spark, NULL in DuckDB).
    *
    * Returns one row per qid present in BOTH inputs: (qid, hits,
    * rel_total, dcg_units, idcg_units, ndcg, mrr_units, precision,
    * recall), doubles rounded to 6. A query whose top-k contains no
    * judged doc emits the ZERO row (hits/dcg/ndcg/precision/recall =
    * 0; mrr_units = 0 encodes "no relevant retrieved") rather than
    * vanishing — dropping exactly the worst queries would inflate
    * macro averages. Reference analog: none — extension surface. */
  def evalAtK(ranked: DataFrame, rel: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"evalAtK: k=$k")
    import org.apache.spark.sql.graftshim.Shim
    def idiv(a: Column, b: Column): Column = Shim.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Shim.expression(a), Shim.expression(b)))
    val UNIT = 1000000000000L
    def d(c: Column): Column = c.cast(DoubleType)
    val grade = when(col("grade").isNull ||
          col("grade") < 1L || col("grade") > 30L,
        raise_error(lit("evalAtK: null grade or grade outside 1..30 — " +
          "0-graded rows must be filtered upstream, >30 overflows the " +
          "2^grade gain, and a NULL would silently count in rel_total " +
          "while contributing no gain")))
      .otherwise(col("grade"))
    // gain = 2^grade − 1, exact integer on both engines (1 << grade);
    // both frames below carry the validated grade as __g
    val gain: Column =
      expr("cast(shiftleft(1, cast(__g as int)) as bigint) - 1")
    def term(r: Column): Column =
      (d(gain) / log(r.cast(DoubleType) + lit(1.0)))
        .cast(DecimalType(20, 12))
    val r = rel.select(col("qid").cast(LongType).as("qid"),
      col("id").cast(LongType).as("id"), grade.cast(LongType).as("__g"))
    val run = ranked.select(col("qid").cast(LongType).as("qid"),
        col("id").cast(LongType).as("id"),
        col("rank").cast(LongType).as("rank"))
      .where(col("rank") <= k)
    val hits = run.join(r, Seq("qid", "id"))
    val dcg = hits
      .select(col("qid"), term(col("rank")).as("__t"),
        col("rank"))
      .groupBy(col("qid"))
      .agg((sum(col("__t")) * lit(UNIT)).cast(LongType).as("dcg_units"),
        count(lit(1)).as("hits"),
        idiv(lit(UNIT), min(col("rank"))).as("mrr_units"))
    // ideal ranking: k best grades per query, deterministic (grade
    // desc, id asc) via the partial-merging heap — window-free
    val ideal = GroupTopK.minKByKey(r, Seq("qid"), "id",
        key = -col("__g"), k)
      .select(col("qid"), (-col("key")).as("__g"),
        col("rank").cast(LongType).as("rank"))
    val idcg = ideal
      .select(col("qid"), term(col("rank")).as("__t"))
      .groupBy(col("qid"))
      .agg((sum(col("__t")) * lit(UNIT)).cast(LongType).as("idcg_units"))
    // uniqueness contract, enforced as loudly as the grade range: a
    // duplicate (qid,id) in `rel` inflates rel_total and idcg, and a
    // duplicate within the cutoff of `ranked` fans out the hits join,
    // double-counting hits/dcg — all silently. Both checks are fused
    // into aggregates the metric already needs (rows == distinct ids
    // per qid iff no duplicate), so enforcement costs no extra scan.
    val relTotal = r.groupBy(col("qid"))
      .agg(count(lit(1)).as("__rt"), countDistinct(col("id")).as("__rtd"))
      .select(col("qid"),
        when(col("__rt") =!= col("__rtd"), raise_error(lit(
          "evalAtK: duplicate (qid,id) in rel — rel_total, idcg and " +
            "the hits join would all double-count; deduplicate the " +
            "judgments upstream")))
          .otherwise(col("__rt")).as("rel_total"))
    // base = qids present in BOTH inputs (the relTotal inner join
    // below restricts to judged qids); dcg only has rows for qids
    // with >= 1 judged doc in the top-k, so it joins LEFT and the
    // zero row (hits/dcg/mrr = 0) survives — dropping the worst
    // queries would silently inflate any macro-averaged metric
    val base = run.groupBy(col("qid"))
      .agg(count(lit(1)).as("__rn"), countDistinct(col("id")).as("__rnd"))
      .select(
        when(col("__rn") =!= col("__rnd"), raise_error(lit(
          "evalAtK: duplicate (qid,id) within the cutoff of ranked — " +
            "the rel join would fan out and double-count hits/dcg; a " +
            "retriever must emit each doc at most once per query")))
          .otherwise(col("qid")).as("qid"))
    val hitsC = coalesce(col("hits"), lit(0L))
    val dcgC = coalesce(col("dcg_units"), lit(0L))
    base.join(idcg, "qid").join(relTotal, "qid")
      .join(dcg, Seq("qid"), "left")
      .select(col("qid"), hitsC.as("hits"), col("rel_total"),
        dcgC.as("dcg_units"),
        when(col("idcg_units") <= 0L, raise_error(lit(
          "evalAtK: idcg_units <= 0 with grade >= 1 rows — impossible " +
            "unless inputs violated the contract")))
          .otherwise(col("idcg_units")).as("idcg_units"),
        round(d(dcgC) / d(col("idcg_units")), 6).as("ndcg"),
        coalesce(col("mrr_units"), lit(0L)).as("mrr_units"),
        round(d(hitsC) / lit(k.toDouble), 6).as("precision"),
        round(d(hitsC) / d(col("rel_total")), 6).as("recall"))
  }
}
