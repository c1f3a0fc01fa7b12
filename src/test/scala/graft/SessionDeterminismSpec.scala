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

  // round-13 session gates whose output involves engine-internal
  // state (staged files, streaming drain, GCM's random IV, the
  // sketch's internal ordering) — re-run identity pins the claim
  // that none of it leaks into the result
  test("q225 entity resolution is identical across runs") {
    twice("q225_entity_resolution")
  }

  test("q228 capped triangle counts are identical across runs") {
    twice("q228_triangles")
  }

  test("q233 approx_top_k output is identical across runs") {
    twice("q233_approx_top_k")
  }

  test("q236 AES round-trip output is identical across runs " +
      "(random GCM IVs never surface)") {
    twice("q236_aes_roundtrip")
  }

  test("q237 incremental rollup is identical across runs " +
      "(staged state re-created bit-identically)") {
    twice("q237_incremental_rollup")
  }

  test("q238 AvailableNow drain is identical across runs") {
    twice("q238_available_now")
  }

  test("q244 bloom-staged aggregate is identical across runs") {
    twice("q244_parquet_bloom")
  }

  /** Same gate under DIFFERENT session parallelism — the stronger
    * claim the round-15 oracle-split gates make: their hashed output
    * must be byte-stable whatever spark.sql.shuffle.partitions is,
    * because the driver's verify session and a production cluster
    * will not share a parallelism setting. q247 in particular rides
    * the q97 packing pipeline whose determinism comes from the FIXED
    * 8-partition range layout, not the session default. */
  private def acrossParallelism(name: String): Unit = {
    val f = SparkEntry.queries(name)
    val narrow = spark.newSession()
    narrow.conf.set("spark.sql.shuffle.partitions", "2")
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "17")
    val a = f(narrow, dir).collect().toSeq.map(_.toString).sorted
    val b = f(wide, dir).collect().toSeq.map(_.toString).sorted
    assert(a.nonEmpty, s"$name: empty result")
    assert(a == b, s"$name: parallelism 2 vs 17 diverged")
  }

  test("q247 packing conservation is parallelism-invariant") {
    acrossParallelism("q247_pack_conserve")
  }

  test("q248 DSIR gram totals are parallelism-invariant") {
    acrossParallelism("q248_dsir_grams")
  }

  test("q249 BPE training frame is parallelism-invariant") {
    acrossParallelism("q249_bpe_frame")
  }

  test("q250 duplicate-segment counters are parallelism-invariant") {
    acrossParallelism("q250_dup_segments")
  }

  test("q252 span corruption is parallelism-invariant") {
    acrossParallelism("q252_span_corrupt")
  }

  test("q253 MLM masking is parallelism-invariant") {
    acrossParallelism("q253_mlm_mask")
  }

  test("q251 pad sequence is parallelism-invariant and exchange-free") {
    acrossParallelism("q251_pad_sequence")
    // row-local pad: one scan, zero shuffles, at ANY corpus size
    val plan = SparkEntry.queries("q251_pad_sequence")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"q251 must stay shuffle-free, got:\n$plan")
  }

  test("q254 FIM transform is parallelism-invariant and exchange-free") {
    acrossParallelism("q254_fim")
    val plan = SparkEntry.queries("q254_fim")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"q254 must stay shuffle-free, got:\n$plan")
  }

  test("q255 NSP pairs are parallelism-invariant") {
    acrossParallelism("q255_nsp")
  }

  test("q256 length buckets are parallelism-invariant") {
    acrossParallelism("q256_len_buckets")
  }

  test("q257 block packing is parallelism-invariant (two-phase " +
      "offsets equal the global prefix sum under any session layout)") {
    acrossParallelism("q257_block_pack")
  }

  test("q258 UL2 mixture routing is parallelism-invariant") {
    acrossParallelism("q258_ul2")
  }

  test("q259 preference pairs are parallelism-invariant") {
    acrossParallelism("q259_pref_pairs")
  }

  test("q260 global running sum is parallelism-invariant (600k-row " +
      "two-phase prefix sum, no one-partition funnel)") {
    acrossParallelism("q260_global_cumsum")
  }

  test("q262 repeat schedule is parallelism-invariant and window-free " +
      "(per-tier totals via groupBy + broadcast join-back, never a " +
      "3-partition Window funnel)") {
    acrossParallelism("q262_repeat_schedule")
    // the round-16 verdict's one scale-killer: Window.partitionBy(tier)
    // forces a third of the corpus through one task — the plan must
    // carry NO window at all and broadcast the 3-row totals back
    val plan = SparkEntry.queries("q262_repeat_schedule")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q262 must not window on the 3-value tier key, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q262 totals must broadcast-join back, got:\n$plan")
  }

  test("q263 SemDeDup survivor accounting is parallelism-invariant") {
    acrossParallelism("q263_sem_survivors")
  }

  test("q264 block materialization is parallelism-invariant (payload " +
      "rides the two-phase offsets under any session layout)") {
    acrossParallelism("q264_block_rows")
  }

  test("q265 BPE-true length buckets are parallelism-invariant") {
    acrossParallelism("q265_bpe_len_buckets")
  }

  test("q266 curriculum staging is parallelism-invariant and " +
      "window-free (global rank via two-phase prefix count, never " +
      "row_number over a global sort)") {
    acrossParallelism("q266_curriculum")
    val plan = SparkEntry.queries("q266_curriculum")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q266 must not plan a global-sort window, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q266 stage totals must broadcast-join back, got:\n$plan")
  }

  test("q267 fertility report is parallelism-invariant") {
    acrossParallelism("q267_fertility")
  }

  test("q268 fact-table global rank is parallelism-invariant and " +
      "window-free") {
    acrossParallelism("q268_global_rank")
    val plan = SparkEntry.queries("q268_global_rank")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q268 must not plan a global-sort window, got:\n$plan")
  }
}
