package graft

import org.apache.spark.sql.functions._

import graft.functions.Functional

/** Pins Kernels.wordShingles to the HOF chain it replaced: identical
  * output for every window size on a battery of whitespace edge cases
  * (the oracle SQL replays the split-regex semantics, so any
  * divergence here is an oracle mismatch waiting to happen). */
class ShinglesParitySpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF implementation, kept as the semantic spec. */
  private def hofShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(n < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), n - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  private val cases = Seq(
    "alpha beta gamma delta epsilon",
    "one",
    "",
    "   leading and trailing spaces   ",
    "a  double  space",
    "\ttab lead",
    "tab trail\t",
    "mixed \t inner\nnewline run",
    "exact two",
    "x y z")

  test("wordShingles matches the HOF chain on whitespace edge cases") {
    for (k <- 1 to 4) {
      val df = cases.toDF("t").select(
        Functional.wordShingles(col("t"), k).as("kernel"),
        hofShingles(col("t"), k).as("hof"))
      val bad = df.where(not(col("kernel") === col("hof"))).count()
      assert(bad === 0, s"k=$k: kernel diverges from HOF on $bad cases")
    }
  }

  test("wordShingles null text yields null") {
    val df = Seq[Option[String]](None).toDF("t")
      .select(Functional.wordShingles(col("t"), 3).as("s"))
    assert(df.head().isNullAt(0))
  }
}
