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

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_c4_filter" -> (q112C4Filter _)
  )

  val oracles: Map[String, String] = Map(
    "q112_c4_filter" -> q112Sql
  )
}
