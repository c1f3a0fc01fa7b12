package graft

/** Re-run determinism pins for the round-12 gates whose output could
  * in principle depend on engine-internal order (global ids from
  * range partitions, wedge-join top-k, the composed refresh, the
  * integer PageRank already pinned in Queries16Spec): two executions
  * must produce IDENTICAL rows — the retry/backfill reproducibility
  * contract every deterministic-pipeline claim rests on.
  */
class SessionDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def twice(name: String): Unit = {
    val f = SparkEntry.queries(name)
    val a = f(spark, dir).collect().toSeq
    val b = f(spark, dir).collect().toSeq
    assert(a.nonEmpty, s"$name: empty result")
    assert(a == b, s"$name: two runs diverged")
  }

  test("q208 global row ids are identical across runs") {
    twice("q208_global_ids")
  }

  test("q216 link-prediction top-20 is identical across runs") {
    twice("q216_link_prediction")
  }

  test("q220 corpus-refresh report is identical across runs") {
    twice("q220_corpus_refresh")
  }

  test("q210 hashing-trick features are identical across runs") {
    twice("q210_hashing_trick")
  }
}
