package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Round-11 continuation queries: corpus-hygiene and format operators
  * past q111 — C4-style document filtering, exact-substring span dedup,
  * sketch-based cardinality/membership, ORC round trips, and the
  * composed filter pipeline. Naming/oracle/float conventions as in
  * [[Queries]]; every gate here is fully DuckDB-oracled unless the
  * semantics are sketch-approximate (then the gate self-checks the
  * published error bound in-query via raise_error).
  */
object Queries7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---- C4-style document filter ----------------------------------------

  /** C4 document-quality filter (Raffel et al. 2020 §2.2; see
    * TextAnalysis.c4Filter for the rule set and the integer-threshold
    * determinism argument). Emits the verdict for EVERY document —
    * (doc_id, keep, reason) — rather than only survivors, so the oracle
    * checks both directions of every rule. Plan: one scan, pure column
    * expressions (the top-word count is a row-local sorted-run fold),
    * no shuffle. */
  def q112C4Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select($"doc_id", TextAnalysis.c4Filter($"text").as("f"))
      .select($"doc_id", $"f.keep".as("keep"), $"f.reason".as("reason"))
      .orderBy($"doc_id")

  val q112Sql: String =
    """WITH w AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(text), '\s+') AS words
      |  FROM documents),
      |u AS (SELECT doc_id, x FROM w, UNNEST(words) AS t(x)),
      |cnt AS (SELECT doc_id, max(c) AS topc FROM (
      |  SELECT doc_id, x, count(*) AS c FROM u GROUP BY 1, 2)
      |  GROUP BY 1),
      |stp AS (SELECT doc_id, count(DISTINCT x) AS nstop FROM u
      |  WHERE x IN ('the','a','of','and','to','in','is','that','it',
      |    'for','on','with','as','are','this')
      |  GROUP BY 1),
      |s AS (SELECT w.doc_id, len(words) AS n,
      |    len(regexp_replace(text, '\s', '', 'g')) AS sumlen,
      |    coalesce(topc, 0) AS topc, coalesce(nstop, 0) AS nstop,
      |    (position('lorem ipsum' IN lower(text)) > 0 OR
      |     position('javascript' IN lower(text)) > 0) AS banned
      |  FROM w LEFT JOIN cnt USING (doc_id)
      |         LEFT JOIN stp USING (doc_id)),
      |r AS (SELECT doc_id, CASE
      |    WHEN n < 15 OR n > 10000 THEN 'word_count'
      |    WHEN sumlen * 10 < n * 42 OR sumlen * 10 > n * 100
      |      THEN 'word_length'
      |    WHEN topc * 100 > n * 20 THEN 'repetition'
      |    WHEN nstop < 2 THEN 'stopwords'
      |    WHEN banned THEN 'banned'
      |    ELSE NULL END AS reason
      |  FROM s)
      |SELECT doc_id, reason IS NULL AS keep, reason
      |FROM r ORDER BY doc_id""".stripMargin

  // ---- exact-substring span dedup --------------------------------------

  /** Exact-substring dedup at k = 8 words (Lee et al., ACL 2022; see
    * Dedup.dedupSpans for semantics and the triplets-only shuffle
    * story). The synthetic corpus genuinely contains ~1k duplicated
    * 8-word spans at sf0.01, so removal is exercised, not vacuous.
    * Fully oracled: DuckDB picks winners by span CONTENT (which also
    * witnesses xxhash64 collision-freedom, as in q107), expands loser
    * positions, and rebuilds kept_text from the uncovered words. */
  def q113SpanDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.dedupSpans(t(s, dir, "documents"),
        "doc_id", "text", k = 8)
      .select($"id".as("doc_id"), $"kept_text", $"n_removed")
      .orderBy($"doc_id")

  val q113Sql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i - 1 AS pos,
      |    array_to_string(words[(i):(i+7)], ' ') AS gram
      |  FROM w, UNNEST(range(1, len(words) - 8 + 2)) AS t(i)),
      |r AS (
      |  SELECT doc_id, pos,
      |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos)
      |      AS rk
      |  FROM g),
      |cov AS (
      |  SELECT DISTINCT doc_id, pos + j.j AS cp
      |  FROM r, UNNEST(range(0, 8)) AS j(j) WHERE rk > 1),
      |wp AS (
      |  SELECT doc_id, i - 1 AS wpos, words[i] AS word
      |  FROM w, UNNEST(range(1, len(words) + 1)) AS t(i)),
      |kept AS (
      |  SELECT wp.doc_id,
      |    string_agg(word, ' ' ORDER BY wpos) AS kept_text
      |  FROM wp LEFT JOIN cov
      |    ON wp.doc_id = cov.doc_id AND wp.wpos = cov.cp
      |  WHERE cov.doc_id IS NULL GROUP BY wp.doc_id),
      |nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY 1)
      |SELECT w.doc_id, coalesce(kept_text, '') AS kept_text,
      |  coalesce(n_removed, 0) AS n_removed
      |FROM w LEFT JOIN kept USING (doc_id) LEFT JOIN nrem USING (doc_id)
      |ORDER BY w.doc_id""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_c4_filter" -> (q112C4Filter _),
    "q113_span_dedup" -> (q113SpanDedup _)
  )

  val oracles: Map[String, String] = Map(
    "q112_c4_filter" -> q112Sql,
    "q113_span_dedup" -> q113Sql
  )
}
