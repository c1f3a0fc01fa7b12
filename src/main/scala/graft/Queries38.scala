package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.TFrame
import graft.operators.{Retrieval, Sampling, Similarity}

/** Round-18 session-2 gates: the funnel-free analytic family completed
  * on the user surface — peer-aware percent_rank/cume_dist (q275),
  * global LAG/LEAD (q276), and a global ROWS-frame rolling sum (q277),
  * each replacing a `... OVER (ORDER BY ...)` one-task window with the
  * two-phase range-partitioned machinery of q260/q266 — plus BM25
  * top-k lexical retrieval (q278), the data-selection primitive the
  * LLM-pipeline surface was missing. Naming/oracle/float conventions
  * as in [[Queries]].
  */
object Queries38 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Unique-key quantity frame shared by q275/q276/q277 — the q272
    * composite key with an integrality raise (Spark truncates and
    * DuckDB rounds on the long cast, so a fractional quantity would
    * silently diverge the order). Quantities repeat heavily across
    * keys, so peer groups are real, not degenerate. */
  private def qtyKeys(s: SparkSession, dir: String, gate: String): DataFrame =
    t(s, dir, "lineitem")
      .select(($"l_orderkey" * 8 + $"l_linenumber").cast(LongType).as("lk"),
        when($"l_quantity" =!= floor($"l_quantity"), raise_error(lit(
          s"$gate: non-integer l_quantity — Spark truncates and DuckDB " +
            "rounds on the long cast, the order would diverge")))
          .otherwise($"l_quantity").cast(LongType).as("q"))
      .groupBy($"lk")
      .agg(sum($"q").as("qty"))

  // ---- q275: peer-aware percent_rank / cume_dist, hashed --------------------

  /** [[TFrame.peerRanksExact]] (percent_rank + cume_dist from ONE
    * shared prefix-count pass) proven
    * against the SQL window functions they replace: both are one IEEE
    * double division of exact integers — (rank−1)/(n−1) with
    * peer-aware rank, and (rows at-or-before)/n — where the integer
    * inputs come from the two-phase prefix count over the DISTINCT
    * order keys (vocabulary-sized exchanges + one join back; the
    * corpus never funnels through a window task). The qty column has
    * heavy ties, so a green hash certifies the PEER semantics (equal
    * keys share percent_rank and cume_dist), not just the ordering. */
  def q275PercentRank(s: SparkSession, dir: String): DataFrame = {
    val ranked = TFrame(qtyKeys(s, dir, "q275"))
      .peerRanksExact(Seq("qty"), "lk", parts = 32,
        prCol = "pr", cdCol = "cd")
    ranked.df.select($"lk", $"qty", $"pr", $"cd")
  }

  val q275Sql: String =
    """WITH d AS (
      |  SELECT l_orderkey * 8 + l_linenumber AS lk,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1)
      |SELECT lk, qty,
      |  percent_rank() OVER (ORDER BY qty) AS pr,
      |  cume_dist() OVER (ORDER BY qty) AS cd
      |FROM d""".stripMargin

  // ---- q276: global LAG/LEAD without the window funnel, hashed ---------------

  /** [[TFrame.lagExact]](3) and [[TFrame.leadExact]](2) over the full
    * unique-key frame in key order — `lag/lead OVER (ORDER BY ...)`
    * plan the same one-task global sort as row_number, yet each row
    * needs a value at most k rows away; the replacement is ONE range
    * exchange plus a bounded parts·k driver carry
    * ([[graft.operators.Packing.shiftInOrder]]), with lead computed
    * as lag over the REVERSED total order. Nulls at both edges (the
    * first 3 / last 2 rows) ride the hash, certifying SQL edge
    * semantics as well as the carry threading across partitions. */
  def q276LagLead(s: SparkSession, dir: String): DataFrame = {
    val shifted = TFrame(qtyKeys(s, dir, "q276"))
      .lagExact("qty", 3, order = Seq.empty, idCol = "lk", parts = 32,
        outCol = "lag3")
      .leadExact("qty", 2, order = Seq.empty, idCol = "lk", parts = 32,
        outCol = "lead2")
    shifted.df.select($"lk", $"qty", $"lag3", $"lead2")
  }

  val q276Sql: String =
    """WITH d AS (
      |  SELECT l_orderkey * 8 + l_linenumber AS lk,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1)
      |SELECT lk, qty,
      |  lag(qty, 3) OVER (ORDER BY lk) AS lag3,
      |  lead(qty, 2) OVER (ORDER BY lk) AS lead2
      |FROM d""".stripMargin

  // ---- q277: exact global rolling sum (ROWS frame), hashed -------------------

  /** [[TFrame.rollingSumExact]] proven against the ROWS-frame window
    * it replaces: a 7-row moving net-revenue balance (6 preceding +
    * current) over the SIGNED q273 cents deltas — returned lineitems
    * post as refunds, so the moving sum crosses zero and certifies
    * the sign-agnostic difference form moving(i) = run(i) − run(i−7).
    * Both passes are the exact two-phase primitives (cumsum, then lag
    * of the running sum); long arithmetic makes the difference form
    * lossless. DuckDB replays the native windowed frame. */
  def q277RollingSum(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(($"l_orderkey" * 8 + $"l_linenumber").cast(LongType)
        .as("lk"),
        (when($"l_returnflag" === "R", -1L).otherwise(1L) *
          ($"l_extendedprice".cast(DecimalType(18, 2)) * lit(100))
            .cast(LongType)).as("sc"))
      .groupBy($"lk")
      .agg(sum($"sc").cast(LongType).as("delta"))
    TFrame(li)
      .rollingSumExact("delta", w = 6, order = Seq.empty, idCol = "lk",
        parts = 32, outCol = "roll_cents")
      .df.select($"lk", $"delta", $"roll_cents")
  }

  val q277Sql: String =
    """WITH d AS (
      |  SELECT l_orderkey * 8 + l_linenumber AS lk,
      |    (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) *
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS sc
      |  FROM lineitem),
      |g AS (SELECT lk, CAST(sum(sc) AS BIGINT) AS delta FROM d GROUP BY lk)
      |SELECT lk, delta,
      |  CAST(sum(delta) OVER (ORDER BY lk
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
      |FROM g""".stripMargin

  // ---- q278: BM25 top-k lexical retrieval, hashed ----------------------------

  /** [[Retrieval.bm25TopK]] over the documents corpus for four fixed
    * queries: the full chain — whitespace postings, vocabulary-sized
    * df/broadcast, per-term Lucene-form idf × tf-norm as the identical
    * IEEE double expression on both engines, DECIMAL(20,12) mediation
    * before the per-doc sum (partition-order-independent), and the
    * window-free partial-merging k-heap per query — restated from
    * first principles in DuckDB, including the ×10¹² integer score
    * witness the top-k orders on. A green hash certifies scores AND
    * the selected/ranked sets bit-for-bit. */
  def q278Bm25(s: SparkSession, dir: String): DataFrame = {
    val queries = retrievalQueries
    Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queries, k = 5)
      .orderBy($"qid", $"rank")
  }

  val q278Sql: String =
    s"""WITH $bm25CorpusCtes,
      |${bm25ScoreCtes("q", "")},
      |r AS (SELECT qid, doc_id, score_units,
      |  row_number() OVER (PARTITION BY qid
      |    ORDER BY score_units DESC, doc_id) AS rk FROM u)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rank,
      |  doc_id, score_units,
      |  CAST(score_units AS DOUBLE) / 1e12 AS score
      |FROM r WHERE rk <= 5 ORDER BY qid, rank""".stripMargin

  // ---- q279: hybrid retrieval via reciprocal-rank fusion, hashed -------------

  /** [[Retrieval.rrfFuse]] over two real sides — the q278 BM25 chain
    * (lexical, k=20 over documents) and the q50 brute-cosine chain
    * (dense, k=20 over embeddings; probe vectors = embeddings of ids
    * 0..3, qid = probe id) — fused per query into top-10 by the exact
    * packed integer key. Fusion is rank-only, so the dense side's
    * doubles never enter the hash; what DuckDB must reproduce is the
    * RANKINGS (the q50 fp-independent rank-compare precedent) and then
    * pure integer arithmetic: u = 10¹² div (60+rank), packed = Σ(8u+1),
    * rrf_units = packed div 8, sides_hit = packed mod 8, top-10 by
    * (packed desc, id asc). Ids present on one side only (a doc with
    * no embedding, a vector whose doc shares no query term) fuse with
    * sides_hit = 1 — the realistic hybrid case — and the doc-id/vec-id
    * spaces are the shared entity-id space by corpus construction. */
  def q279HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val queries = retrievalQueries
    val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queries, k = 20)
      .select($"qid", $"doc_id".as("id"), $"rank")
    val emb = t(s, dir, "embeddings")
    val den = Similarity.bruteForceTopK(emb, emb.where($"vec_id" < 4),
        "embedding", "vec_id", "vec_id", k = 20)
      .select($"probe_id".as("qid"), $"id", $"rank")
    Retrieval.rrfFuse(Seq(lex, den), "qid", "id", "rank", k = 10)
      .orderBy($"qid", $"rank")
  }

  val q279Sql: String =
    s"""WITH $bm25CorpusCtes,
      |${bm25ScoreCtes("q", "")},
      |lex AS (SELECT qid, doc_id AS id, rk AS rnk FROM (
      |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY score_units DESC, doc_id) AS rk FROM u)
      |  WHERE rk <= 20),
      |den AS (SELECT probe_id AS qid, id, rank AS rnk FROM (
      |  SELECT p.vec_id AS probe_id, c.vec_id AS id,
      |    ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
      |      list_cosine_similarity(c.embedding, p.embedding) DESC,
      |      c.vec_id ASC) AS rank
      |  FROM embeddings c, embeddings p
      |  WHERE p.vec_id < 4 AND c.vec_id <> p.vec_id)
      |  WHERE rank <= 20),
      |pk AS (SELECT qid, id,
      |  CAST(SUM((1000000000000 // (60 + rnk)) * 8 + 1) AS BIGINT)
      |    AS packed
      |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)
      |  GROUP BY 1, 2),
      |r AS (SELECT qid, id, packed, row_number() OVER (PARTITION BY qid
      |  ORDER BY packed DESC, id) AS rank FROM pk)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank, id,
      |  CAST(packed // 8 AS BIGINT) AS rrf_units,
      |  CAST(packed % 8 AS BIGINT) AS sides_hit
      |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** The fixed retrieval query set shared by q278-q285. */
  private val retrievalQueries = Seq(
    0L -> "hash join",
    1L -> "sort merge join",
    2L -> "window agg stream",
    3L -> "vector scan fast")

  /** The q280/q285 shared judgment set: grade = number of distinct
    * query terms the document contains, kept at grade >= 2 so the
    * judgment is STRICTER than BM25's any-term match condition. ONE
    * definition, so the evaluation gate and the hard-negative gate
    * provably consume the identical relevance set. */
  private def gradedRel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val qterms = retrievalQueries
      .flatMap { case (qid, q) =>
        q.trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(tm => (qid, tm))
      }
      .toDF("qid", "term")
    t(s, dir, "documents")
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      .distinct()
      .join(broadcast(qterms), "term")
      .groupBy($"qid", $"doc_id")
      .agg(count(lit(1)).as("grade"))
      .where($"grade" >= 2L)
      .select($"qid", $"doc_id".as("id"), $"grade")
  }

  // ---- q280: judged retrieval evaluation (nDCG/MRR/P/R @10), hashed ----------

  /** [[Retrieval.evalAtK]] grading the q278 BM25 run (k=20) against a
    * relevance set DERIVED FROM DATA: grade = number of distinct query
    * terms a document contains, kept at grade >= 2 so the judgment is
    * STRICTER than the retriever's match condition (single-term docs
    * score BM25 points but count as non-relevant) — precision, MRR and
    * nDCG are then real measurements, not tautologies. DCG uses the
    * natural-log discount so both engines evaluate the identical IEEE
    * chain; every term passes DECIMAL(20,12) before the per-query sum;
    * mrr_units is pure integer division; each ratio is one double
    * division of exact integers. The ideal ranking is the k-heap over
    * the relevance set (grade desc, id asc), window-free. */
  def q280RetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val run = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        retrievalQueries, k = 20)
      .select($"qid", $"doc_id".as("id"), $"rank")
    Retrieval.evalAtK(run, gradedRel(s, dir), k = 10).orderBy($"qid")
  }

  val q280Sql: String =
    s"""WITH $bm25CorpusCtes,
      |${bm25ScoreCtes("q", "")},
      |run AS (SELECT qid, doc_id AS id, rk AS rank FROM (
      |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY score_units DESC, doc_id) AS rk FROM u)
      |  WHERE rk <= 20),
      |rel AS (
      |  SELECT qid, doc_id AS id, COUNT(*) AS grade FROM (
      |    SELECT DISTINCT q.qid, q.term, tok.doc_id FROM tok
      |    JOIN q USING (term))
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |hits AS (SELECT run.qid, run.id, run.rank, rel.grade
      |  FROM run JOIN rel USING (qid, id) WHERE run.rank <= 10),
      |dcg AS (SELECT qid,
      |  CAST(SUM(CAST(CAST((1 << grade) - 1 AS DOUBLE) / ln(CAST(rank AS DOUBLE) + 1.0)
      |    AS DECIMAL(20,12))) * 1000000000000 AS BIGINT) AS dcg_units,
      |  CAST(COUNT(*) AS BIGINT) AS hits,
      |  CAST(1000000000000 // MIN(rank) AS BIGINT) AS mrr_units
      |  FROM hits GROUP BY 1),
      |ideal AS (SELECT qid, grade, row_number() OVER (PARTITION BY qid
      |  ORDER BY grade DESC, id) AS rank FROM rel),
      |idcg AS (SELECT qid,
      |  CAST(SUM(CAST(CAST((1 << grade) - 1 AS DOUBLE) / ln(CAST(rank AS DOUBLE) + 1.0)
      |    AS DECIMAL(20,12))) * 1000000000000 AS BIGINT) AS idcg_units
      |  FROM ideal WHERE rank <= 10 GROUP BY 1),
      |relt AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS rel_total
      |  FROM rel GROUP BY 1),
      |base AS (SELECT DISTINCT qid FROM run
      |  INTERSECT SELECT DISTINCT qid FROM rel)
      |SELECT CAST(qid AS BIGINT) AS qid,
      |  CAST(coalesce(hits, 0) AS BIGINT) AS hits, rel_total,
      |  CAST(coalesce(dcg_units, 0) AS BIGINT) AS dcg_units,
      |  idcg_units,
      |  round(CAST(coalesce(dcg_units, 0) AS DOUBLE)
      |    / CAST(idcg_units AS DOUBLE), 6) AS ndcg,
      |  CAST(coalesce(mrr_units, 0) AS BIGINT) AS mrr_units,
      |  round(CAST(coalesce(hits, 0) AS DOUBLE) / 10.0, 6) AS "precision",
      |  round(CAST(coalesce(hits, 0) AS DOUBLE)
      |    / CAST(rel_total AS DOUBLE), 6) AS recall
      |FROM base JOIN idcg USING (qid) JOIN relt USING (qid)
      |  LEFT JOIN dcg USING (qid)
      |ORDER BY qid""".stripMargin

  // ---- q281: temperature-scaled domain mixture (alpha sampling), hashed ------

  /** [[graft.operators.Sampling.mixByTemperature]] at alpha=0.5 over
    * the documents languages — the XLM-R/mT5 low-resource boost,
    * realized duplication-free: shares land exactly ∝ √n_lang with the
    * smallest language kept in full. The oracle recomputes the counts,
    * w = power(n, 0.5), m = min(n/w), the argmin-pinned fractions, the
    * floor(f·8192) thresholds, and the splitmix64 buckets — the entire
    * chain engine-portable (the q106 discipline; pow is the one
    * cross-engine trust point and this hash pins it). Output is the
    * q106 shape: per-language kept count + kept id sum. */
  def q281TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val mixed = Sampling.mixByTemperature(t(s, dir, "documents"),
      $"lang", $"doc_id", alpha = 0.5, seed = 47L)
    mixed.groupBy($"lang")
      .agg(count(lit(1)).as("kept_n"), sum($"doc_id").as("kept_id_sum"))
      .orderBy($"lang")
  }

  val q281Sql: String =
    s"""WITH ${Queries5.bucketCtes("tm", 47L, "documents", "doc_id")},
       |cnt AS (SELECT lang, COUNT(*) AS n FROM documents
       |  WHERE lang IS NOT NULL GROUP BY lang),
       |w AS (SELECT lang, n,
       |  power(CAST(n AS DOUBLE), CAST(0.5 AS DOUBLE)) AS w FROM cnt),
       |mm AS (SELECT MIN(CAST(n AS DOUBLE) / w) AS m FROM w),
       |thr AS (SELECT w.lang,
       |  CAST(floor(CASE WHEN CAST(n AS DOUBLE) / w = mm.m
       |    THEN CAST(1.0 AS DOUBLE)
       |    ELSE LEAST(CAST(1.0 AS DOUBLE),
       |      w * mm.m / CAST(n AS DOUBLE)) END * 8192) AS INTEGER) AS th
       |  FROM w CROSS JOIN mm),
       |j AS (SELECT d.lang, d.doc_id, tmb.bucket
       |  FROM documents d JOIN tmb ON d.doc_id = tmb.k)
       |SELECT j.lang, COUNT(*) AS kept_n,
       |  CAST(SUM(j.doc_id) AS BIGINT) AS kept_id_sum
       |FROM j JOIN thr ON j.lang = thr.lang
       |WHERE j.bucket < thr.th
       |GROUP BY j.lang ORDER BY j.lang""".stripMargin

  // ---- q282: leakage-safe train/test split (split by dup-GROUP), hashed ------

  /** Near-dup-aware train/test split — the data-hygiene rule that a
    * duplicate GROUP must land on one side of the split (a test doc
    * whose near-twin sits in train is leaked evaluation data). The
    * composition: connected components over the q88 pair graph (the
    * SAME jaccardPairFixture — one definition, three gates), split key
    * = coalesce(component, doc_id), label =
    * [[graft.operators.Sampling.splitLabel]] over THAT key, so every
    * member follows its group representative by construction. Two
    * witnesses ride the hash: an in-gate raise if any group spans
    * splits (the end-to-end construction certificate), and
    * `naive_leak_groups` — how many groups a doc-keyed split WOULD
    * have torn apart on this corpus, the measured reason this
    * operator exists. Scale shape: components are pair-graph-sized,
    * the corpus takes one broadcast join + the stateless splitmix64
    * filter — never shuffled. */
  def q282LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val weights = Seq("train" -> 0.8, "test" -> 0.2)
    val comp = graft.operators.Dedup
      .connectedComponents(Queries6.jaccardPairFixture(s, dir))
      .select($"id", $"component")
    val docs = t(s, dir, "documents").select($"doc_id")
    val rep = docs.join(broadcast(comp), $"doc_id" === $"id", "left")
      .select($"doc_id", $"component",
        coalesce($"component", $"doc_id").as("rep"))
    val lab = rep
      .withColumn("split", Sampling.splitLabel($"rep", weights, 23L))
      .withColumn("nsplit", Sampling.splitLabel($"doc_id", weights, 23L))
    val spanning = lab.where($"component".isNotNull)
      .groupBy($"component")
      .agg(count_distinct($"split").as("nl"))
      .agg(coalesce(sum(when($"nl" > 1L, 1L).otherwise(0L)), lit(0L))
        .as("spanning"))
      .select(when($"spanning" === 0L, lit(0L)).otherwise(raise_error(
        lit("q282: a duplicate group spans splits — the rep-keyed " +
          "label is group-constant by construction, this is a bug")))
        .as("spanning_groups"))
    val naiveLeak = lab.where($"component".isNotNull)
      .groupBy($"component")
      .agg(count_distinct($"nsplit").as("nl"))
      .agg(coalesce(sum(when($"nl" > 1L, 1L).otherwise(0L)), lit(0L))
        .as("naive_leak_groups"))
    lab.groupBy($"split")
      .agg(count(lit(1)).as("n"),
        sum($"doc_id").as("id_sum"),
        sum(when($"component".isNotNull, 1L).otherwise(0L))
          .as("grouped_n"))
      .crossJoin(broadcast(spanning))
      .crossJoin(broadcast(naiveLeak))
      .orderBy($"split")
  }

  // threshold: floor(0.8*8192) = 6553 (Sampling.threshold floor
  // semantics, spelled as a literal per the q83 discipline)
  val q282Sql: String = {
    val closure = Queries6.closureCtes
    s"""WITH RECURSIVE $closure,
       |comp AS (SELECT src AS id, MIN(dst) AS component
       |  FROM reach GROUP BY src),
       |rep AS (SELECT d2.doc_id, c.component,
       |    coalesce(c.component, d2.doc_id) AS rep
       |  FROM documents d2 LEFT JOIN comp c ON d2.doc_id = c.id),
       |repd AS (SELECT DISTINCT rep FROM rep),
       |${Queries5.bucketCtes("sg", 23L, "repd", "rep")},
       |${Queries5.bucketCtes("nv", 23L, "documents", "doc_id")},
       |lab AS (SELECT r.doc_id, r.component,
       |    CASE WHEN sgb.bucket < 6553 THEN 'train' ELSE 'test' END
       |      AS split,
       |    CASE WHEN nvb.bucket < 6553 THEN 'train' ELSE 'test' END
       |      AS nsplit
       |  FROM rep r JOIN sgb ON r.rep = sgb.k
       |    JOIN nvb ON r.doc_id = nvb.k),
       |span AS (SELECT CAST(coalesce(SUM(CASE WHEN nl > 1 THEN 1 END), 0)
       |    AS BIGINT) AS spanning_groups
       |  FROM (SELECT component, COUNT(DISTINCT split) AS nl FROM lab
       |    WHERE component IS NOT NULL GROUP BY component)),
       |leak AS (SELECT CAST(coalesce(SUM(CASE WHEN nl > 1 THEN 1 END), 0)
       |    AS BIGINT) AS naive_leak_groups
       |  FROM (SELECT component, COUNT(DISTINCT nsplit) AS nl FROM lab
       |    WHERE component IS NOT NULL GROUP BY component))
       |SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(CASE WHEN component IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS grouped_n,
       |  spanning_groups, naive_leak_groups
       |FROM lab CROSS JOIN span CROSS JOIN leak
       |GROUP BY split, spanning_groups, naive_leak_groups
       |ORDER BY split""".stripMargin
  }

  // ---- q283: BM25 with pseudo-relevance-feedback expansion, hashed -----------

  /** The shared DuckDB corpus/query CTE prefix for the BM25 oracles
    * (q278/q279/q280/q283/q285): postings, lengths, document
    * frequencies, corpus totals, and the fixed [[retrievalQueries]] as
    * a VALUES relation — ONE definition, so a tweak to the corpus
    * statistics cannot silently diverge one gate's oracle from the
    * operator. */
  // a def, not a val: the q278/q279/q280 oracle vals above initialize
  // BEFORE this point in object-init order — a val here would
  // interpolate as null into them
  private def bm25CorpusCtes: String =
    """tok AS (
      |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      |tot AS (SELECT SUM(dl) AS tot FROM dl),
      |q(qid, term) AS (VALUES
      |  (0,'hash'),(0,'join'),
      |  (1,'sort'),(1,'merge'),(1,'join'),
      |  (2,'window'),(2,'agg'),(2,'stream'),
      |  (3,'vector'),(3,'scan'),(3,'fast'))""".stripMargin

  /** DuckDB BM25 scoring CTEs against query relation `qRel(qid, term)`
    * — the q278 chain parameterized so q283 can run it twice (original
    * and expanded query sets) in one statement. Emits `u$tag(qid,
    * doc_id, score_units)`. */
  private def bm25ScoreCtes(qRel: String, tag: String): String =
    s"""sc$tag AS (
       |  SELECT qq.qid, tf.doc_id,
       |    CAST(
       |      ln(1.0 + (CAST(n.n AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
       |        / (CAST(dfreq.df AS DOUBLE) + 0.5))
       |      * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0)) /
       |         (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |          ((1.0 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) *
       |           (CAST(dl.dl AS DOUBLE) /
       |            (CAST(tot.tot AS DOUBLE) / CAST(n.n AS DOUBLE))))))
       |      AS DECIMAL(20,12)) AS s
       |  FROM tf JOIN $qRel qq USING (term) JOIN dfreq USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN tot),
       |agg$tag AS (SELECT qid, doc_id, CAST(SUM(s) AS DECIMAL(20,12))
       |    AS score FROM sc$tag GROUP BY 1, 2),
       |u$tag AS (SELECT qid, doc_id,
       |  CAST(score * 1000000000000 AS BIGINT) AS score_units
       |  FROM agg$tag)""".stripMargin

  /** [[Retrieval.bm25PrfTopK]] end-to-end: BM25 feedback run (top-5
    * docs per query), RM1 term weights Σ tf/dl over the feedback set
    * (each division one IEEE expression, DECIMAL-mediated,
    * ×10¹²-witnessed), the 3 heaviest terms (weight desc, term asc)
    * appended to the query, and the expanded BM25 re-run — DuckDB
    * replays BOTH scoring passes, the feedback selection, the RM1
    * arithmetic, and the expansion pick in one statement. A green hash
    * certifies the full two-stage chain, including that both engines
    * chose the SAME expansion vocabulary. */
  def q283PrfExpansion(s: SparkSession, dir: String): DataFrame = {
    val queries = retrievalQueries
    Retrieval.bm25PrfTopK(t(s, dir, "documents"), "doc_id", "text",
        queries, k = 5, fbDocs = 5, fbTerms = 3)
      .orderBy($"qid", $"rank")
  }

  val q283Sql: String =
    s"""WITH $bm25CorpusCtes,
       |${bm25ScoreCtes("q", "1")},
       |fb AS (SELECT qid, doc_id FROM (
       |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_units DESC, doc_id) AS rk FROM u1)
       |  WHERE rk <= 5),
       |rm1 AS (SELECT fb.qid, tf.term,
       |  CAST(SUM(CAST(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)
       |    AS DECIMAL(20,12))) * 1000000000000 AS BIGINT) AS wu
       |  FROM fb JOIN tf USING (doc_id) JOIN dl USING (doc_id)
       |  GROUP BY 1, 2),
       |ex AS (SELECT qid, term FROM (
       |  SELECT qid, term, row_number() OVER (PARTITION BY qid
       |    ORDER BY wu DESC, term) AS rk FROM rm1)
       |  WHERE rk <= 3),
       |q2 AS (SELECT qid, term FROM q UNION
       |  SELECT qid, term FROM ex),
       |${bm25ScoreCtes("q2", "2")},
       |r AS (SELECT qid, doc_id, score_units,
       |  row_number() OVER (PARTITION BY qid
       |    ORDER BY score_units DESC, doc_id) AS rk FROM u2)
       |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rank,
       |  doc_id, score_units,
       |  CAST(score_units AS DOUBLE) / 1e12 AS score
       |FROM r WHERE rk <= 5 ORDER BY qid, rank""".stripMargin

  // ---- q284: Zipf fit over the term-frequency spectrum, hashed ---------------

  /** Corpus-statistics capstone: the Zipf law fit ln(freq) ~ a + b·ln(rank)
    * computed entirely on the FREQUENCY SPECTRUM — (freq → #types),
    * O(√tokens) rows — with rank(f) = #types of frequency ≥ f derived
    * by [[graft.operators.Packing.prefixSumInOrder]] over the spectrum
    * in freq-descending order (idCol = freq itself: unique integral by
    * construction — the two-phase primitive reused on a REAL derived
    * table, not a key column). Never a per-term rank: the vocabulary
    * is never ranked row-by-row, so there is no vocabulary-sized
    * window anywhere. Exactness: each point's ln(rank), ln(freq),
    * products mediate through DECIMAL(20,9) so the OLS sums are exact
    * and partition-order-independent; slope/intercept are then ONE
    * double chain over those exact sums (the q173 regr convention,
    * made explicit), rounded to 6. Output: type/token/spectrum counts
    * + the ×10⁹ integer sum witnesses + slope/intercept. */
  def q284ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val tfreq = t(s, dir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("freq"))
    val spec = tfreq.groupBy($"freq").agg(count(lit(1)).as("ntypes"))
      .withColumn("negf", -$"freq")
    val pre = graft.operators.Packing.prefixSumInOrder(
      spec, "freq", "ntypes", Seq("negf"), parts = 8)
    def d(c: Column): Column = c.cast(DoubleType)
    def m9(c: Column): Column = c.cast(DecimalType(20, 9))
    val pts = pre.select(
      log(d($"global_start" + $"ntypes")).as("x"),
      log(d($"freq")).as("y"),
      $"ntypes", $"freq")
    val UNIT9 = 1000000000L
    val sums = pts.agg(
      count(lit(1)).as("n_points"),
      sum($"ntypes").cast(LongType).as("n_types"),
      sum($"ntypes" * $"freq").cast(LongType).as("n_tokens"),
      (sum(m9($"x")) * UNIT9).cast(LongType).as("sx_units"),
      (sum(m9($"y")) * UNIT9).cast(LongType).as("sy_units"),
      (sum(m9($"x" * $"y")) * UNIT9).cast(LongType).as("sxy_units"),
      (sum(m9($"x" * $"x")) * UNIT9).cast(LongType).as("sxx_units"))
    // slope/intercept: one IEEE chain over the exact integer sums
    def f(c: Column): Column = d(c) / lit(1.0e9)
    val nD = d($"n_points")
    val den0 = nD * f($"sxx_units") - f($"sx_units") * f($"sx_units")
    // a single-point spectrum (every term equally frequent) zeroes the
    // OLS denominator: x/0 is NaN in Spark but NULL in DuckDB — raise
    // loudly instead of silently diverging (the q260/q268 convention)
    val den = when(den0 === 0.0, raise_error(lit(
      "q284: degenerate frequency spectrum (single point) — the Zipf " +
        "OLS denominator is zero; the fit is undefined on this corpus")))
      .otherwise(den0)
    val slope = (nD * f($"sxy_units") - f($"sx_units") * f($"sy_units")) /
      den
    sums.select($"n_points", $"n_types", $"n_tokens",
      $"sx_units", $"sy_units", $"sxy_units", $"sxx_units",
      round(slope, 6).as("slope"),
      round((f($"sy_units") - slope * f($"sx_units")) / nD, 6)
        .as("icept"))
  }

  val q284Sql: String =
    """WITH tok AS (
      |  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tfreq AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY 1),
      |spec AS (SELECT freq, COUNT(*) AS ntypes FROM tfreq GROUP BY 1),
      |pre AS (SELECT freq, ntypes,
      |  CAST(coalesce(SUM(ntypes) OVER (ORDER BY freq DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS global_start
      |  FROM spec),
      |pts AS (SELECT ntypes, freq,
      |  ln(CAST(global_start + ntypes AS DOUBLE)) AS x,
      |  ln(CAST(freq AS DOUBLE)) AS y FROM pre),
      |sums AS (SELECT
      |  CAST(COUNT(*) AS BIGINT) AS n_points,
      |  CAST(SUM(ntypes) AS BIGINT) AS n_types,
      |  CAST(SUM(ntypes * freq) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CAST(x AS DECIMAL(20,9))) * 1000000000 AS BIGINT)
      |    AS sx_units,
      |  CAST(SUM(CAST(y AS DECIMAL(20,9))) * 1000000000 AS BIGINT)
      |    AS sy_units,
      |  CAST(SUM(CAST(x * y AS DECIMAL(20,9))) * 1000000000 AS BIGINT)
      |    AS sxy_units,
      |  CAST(SUM(CAST(x * x AS DECIMAL(20,9))) * 1000000000 AS BIGINT)
      |    AS sxx_units
      |  FROM pts)
      |SELECT n_points, n_types, n_tokens, sx_units, sy_units, sxy_units,
      |  sxx_units,
      |  round((CAST(n_points AS DOUBLE) * (CAST(sxy_units AS DOUBLE) / 1e9)
      |    - (CAST(sx_units AS DOUBLE) / 1e9) * (CAST(sy_units AS DOUBLE) / 1e9))
      |   / (CAST(n_points AS DOUBLE) * (CAST(sxx_units AS DOUBLE) / 1e9)
      |    - (CAST(sx_units AS DOUBLE) / 1e9) * (CAST(sx_units AS DOUBLE) / 1e9)),
      |   6) AS slope,
      |  round(((CAST(sy_units AS DOUBLE) / 1e9)
      |    - ((CAST(n_points AS DOUBLE) * (CAST(sxy_units AS DOUBLE) / 1e9)
      |      - (CAST(sx_units AS DOUBLE) / 1e9) * (CAST(sy_units AS DOUBLE) / 1e9))
      |     / (CAST(n_points AS DOUBLE) * (CAST(sxx_units AS DOUBLE) / 1e9)
      |      - (CAST(sx_units AS DOUBLE) / 1e9) * (CAST(sx_units AS DOUBLE) / 1e9)))
      |      * (CAST(sx_units AS DOUBLE) / 1e9)) / CAST(n_points AS DOUBLE),
      |   6) AS icept
      |FROM sums""".stripMargin

  // ---- q285: hard-negative mining for contrastive training, hashed -----------

  /** Contrastive-training data prep: per query, the highest-BM25-scored
    * documents that are NOT in the judgment set — hard negatives, the
    * examples that teach an embedding model the decision boundary
    * (random negatives are trivially separable). Mined from the FULL
    * scored set ([[Retrieval.bm25Scores]]) rather than a fixed-depth
    * run: BM25 correctly puts multi-term matches first, so the
    * non-relevant band starts BELOW the judgment set at a corpus-
    * dependent depth — any top-k prefix deep enough at one SF is
    * all-relevant at another (measured: k=1000 mines 12 negatives at
    * sf0.01 and ZERO on the 10× replica). judgments = the SAME
    * gradedRel set q280 evaluates against (one definition, two
    * gates); negatives = scored ANTI-JOIN judgments, top-3 per query
    * by (score desc, id asc) via the window-free k-heap. */
  def q285HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val queries = retrievalQueries
    val scored = Retrieval.bm25Scores(t(s, dir, "documents"), "doc_id",
        "text", queries)
      .select($"qid", $"doc_id".as("id"), $"score_units")
    val negs = scored.join(gradedRel(s, dir).select($"qid", $"id"),
      Seq("qid", "id"), "left_anti")
    graft.operators.GroupTopK.minKByKey(negs, Seq("qid"), "id",
        key = -$"score_units", k = 3)
      .select($"qid", col("rank").cast(LongType).as("neg_rank"),
        $"id", (-$"key").as("score_units"))
      .orderBy($"qid", $"neg_rank")
  }

  val q285Sql: String =
    s"""WITH $bm25CorpusCtes,
      |${bm25ScoreCtes("q", "")},
      |rel AS (
      |  SELECT qid, doc_id AS id FROM (
      |    SELECT DISTINCT q.qid, q.term, tok.doc_id FROM tok
      |    JOIN q USING (term))
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |negs AS (SELECT u.qid, u.doc_id AS id, u.score_units FROM u
      |  WHERE NOT EXISTS (SELECT 1 FROM rel
      |    WHERE rel.qid = u.qid AND rel.id = u.doc_id)),
      |nr AS (SELECT qid, id, score_units,
      |  row_number() OVER (PARTITION BY qid
      |    ORDER BY score_units DESC, id) AS neg_rank
      |  FROM negs)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(neg_rank AS BIGINT)
      |    AS neg_rank, id, score_units
      |FROM nr WHERE neg_rank <= 3 ORDER BY qid, neg_rank""".stripMargin

  // ---- q286: SFT prompt-masking prep, hashed ---------------------------------

  /** [[graft.operators.Denoise.sftMask]] end-to-end: deterministic
    * ragged prompt/response token arrays derived arithmetically from
    * doc_id (prompt length 1..7, response length 2..6 — totals span
    * 4..14 around maxLen=10, so the LEFT-truncation path and the
    * no-truncation path both ride the hash), eos appended, prompt
    * masked to −100 in the labels, truncation dropping only
    * ignore-labeled positions (n_supervised = |response|+1 always —
    * the raise guarantees the supervised span fits). DuckDB rebuilds
    * the arrays with range() and replays concat/transform/slice
    * bit-for-bit — the q251 array-hash precedent. */
  def q286SftMask(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select($"doc_id",
      sequence($"doc_id" * 1000 + 1,
        $"doc_id" * 1000 + ($"doc_id" % 7 + 1)).as("p"),
      sequence($"doc_id" * 1000 + 100,
        $"doc_id" * 1000 + 99 + ($"doc_id" % 5 + 2)).as("r"))
    def flat(c: Column): Column =
      array_join(transform(c, _.cast(StringType)), ",")
    graft.operators.Denoise.sftMask(base, "p", "r", eosId = 2L,
        maxLen = 10)
      .select($"doc_id", flat($"input_ids").as("input_ids"),
        flat($"labels").as("labels"), $"n_tokens", $"n_supervised")
      .orderBy($"doc_id")
  }

  val q286Sql: String =
    """WITH d AS (SELECT doc_id,
      |    doc_id % 7 + 1 AS np, doc_id % 5 + 2 AS nr FROM documents),
      |arr AS (SELECT doc_id, np, nr,
      |  range(doc_id * 1000 + 1, doc_id * 1000 + np + 1) AS p,
      |  range(doc_id * 1000 + 100, doc_id * 1000 + 100 + nr) AS r
      |  FROM d),
      |built AS (SELECT doc_id, np, nr,
      |  np + nr + 1 AS tot_len,
      |  p || r || [CAST(2 AS BIGINT)] AS ids,
      |  list_transform(p, x -> CAST(-100 AS BIGINT)) || r ||
      |    [CAST(2 AS BIGINT)] AS labels
      |  FROM arr)
      |SELECT doc_id,
      |  array_to_string(CASE WHEN tot_len > 10
      |    THEN ids[tot_len - 9 : tot_len] ELSE ids END, ',')
      |    AS input_ids,
      |  array_to_string(CASE WHEN tot_len > 10
      |    THEN labels[tot_len - 9 : tot_len] ELSE labels END, ',')
      |    AS labels,
      |  CAST(least(tot_len, 10) AS BIGINT) AS n_tokens,
      |  CAST(nr + 1 AS BIGINT) AS n_supervised
      |FROM built ORDER BY doc_id""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q275_percent_rank" -> (q275PercentRank _),
    "q276_lag_lead" -> (q276LagLead _),
    "q277_rolling_sum" -> (q277RollingSum _),
    "q278_bm25_topk" -> (q278Bm25 _),
    "q279_hybrid_rrf" -> (q279HybridRrf _),
    "q280_retrieval_eval" -> (q280RetrievalEval _),
    "q281_temperature_mix" -> (q281TemperatureMix _),
    "q282_leakage_safe_split" -> (q282LeakageSafeSplit _),
    "q283_prf_expansion" -> (q283PrfExpansion _),
    "q284_zipf_fit" -> (q284ZipfFit _),
    "q285_hard_negatives" -> (q285HardNegatives _),
    "q286_sft_mask" -> (q286SftMask _)
  )

  val oracles: Map[String, String] = Map(
    "q275_percent_rank" -> q275Sql,
    "q276_lag_lead" -> q276Sql,
    "q277_rolling_sum" -> q277Sql,
    "q278_bm25_topk" -> q278Sql,
    "q279_hybrid_rrf" -> q279Sql,
    "q280_retrieval_eval" -> q280Sql,
    "q281_temperature_mix" -> q281Sql,
    "q282_leakage_safe_split" -> q282Sql,
    "q283_prf_expansion" -> q283Sql,
    "q284_zipf_fit" -> q284Sql,
    "q285_hard_negatives" -> q285Sql,
    "q286_sft_mask" -> q286Sql
  )
}
