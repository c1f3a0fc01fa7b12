package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** DSIR importance weighting (TextAnalysis.dsirLogRatios/dsirScore;
  * gate q95_dsir). Proves the selection contract (in-domain docs
  * out-score out-of-domain ones), table shape, and determinism under
  * repartitioning. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 512

  private lazy val target = Seq(
    "climate model ocean carbon flux",
    "ocean carbon model climate sink",
    "carbon flux climate ocean model").toDF("text")

  private lazy val raw = Seq(
    "climate model ocean carbon flux",
    "football score goal match referee",
    "recipe butter flour sugar oven",
    "stock market price index trade").toDF("text")

  test("log-ratio table has nBuckets finite entries") {
    val tab = TextAnalysis.dsirLogRatios(target, raw, "text", B)
    assert(tab.length === B)
    assert(tab.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("in-domain docs out-score out-of-domain docs") {
    val tab = TextAnalysis.dsirLogRatios(target, raw, "text", B)
    val scores = raw
      .select(col("text"), TextAnalysis.dsirScore(col("text"), tab, B)
        .as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val inDomain = scores("climate model ocean carbon flux")
    assert(scores.removed("climate model ocean carbon flux")
      .values.forall(_ < inDomain),
      s"in-domain $inDomain not above $scores")
  }

  test("fit and scores are deterministic under repartitioning") {
    val t2 = target.repartition(5)
    val r2 = raw.repartition(7)
    val a = TextAnalysis.dsirLogRatios(target, raw, "text", B)
    val b = TextAnalysis.dsirLogRatios(t2, r2, "text", B)
    assert(a.toSeq === b.toSeq)
    val s1 = raw.select(TextAnalysis.dsirScore(col("text"), a, B))
      .collect().map(_.getDouble(0)).toSeq
    val s2 = r2.select(TextAnalysis.dsirScore(col("text"), a, B))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(s1.sorted === s2)
  }
}
