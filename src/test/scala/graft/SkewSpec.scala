package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Skew}

/** The shared group-cap discipline: deterministic per-key caps with
  * drop accounting (rows and pairs), composed by the Dedup LSH family
  * and the q216 wedge join. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hub group (g=1, 7 members), one normal (g=2, 3), one singleton
  private lazy val groups = Seq(
    (1, 10L), (1, 11L), (1, 12L), (1, 13L), (1, 14L), (1, 15L), (1, 16L),
    (2, 20L), (2, 21L), (2, 22L),
    (3, 30L)).toDF("g", "id")

  test("cap idle: kept == input, zero drops in both accountings") {
    val cap = Skew.capGroups(groups, Seq("g"), Seq(col("id")), 100)
    assert(cap.kept.count() === 11L)
    assert(col0(cap.droppedRows()) === Seq(0L))
    assert(col0(cap.droppedPairs()) === Seq(0L))
  }

  test("cap fires: lowest-ordered rows kept, drops exact") {
    val cap = Skew.capGroups(groups, Seq("g"), Seq(col("id")), 4)
    val kept = cap.kept.where(col("g") === 1).orderBy("id")
    assert(col0(kept.select("id")) === Seq(10L, 11L, 12L, 13L))
    // hub lost 3 members…
    assert(col0(cap.droppedRows()) === Seq(3L))
    // …and C(7,2) − C(4,2) = 21 − 6 = 15 within-group pairs
    assert(col0(cap.droppedPairs()) === Seq(15L))
  }

  test("droppedPairs sums across multiple capped groups") {
    val cap = Skew.capGroups(groups, Seq("g"), Seq(col("id")), 2)
    // g1: C(7,2)−C(2,2)=21−1=20; g2: C(3,2)−1=2; g3 idle
    assert(col0(cap.droppedPairs()) === Seq(22L))
    assert(col0(cap.droppedRows()) === Seq(5L + 1L))
  }

  test("attachDroppedPairs broadcasts a constant column") {
    val cap = Skew.capGroups(groups, Seq("g"), Seq(col("id")), 4)
    val out = cap.attachDroppedPairs(
      cap.kept.groupBy("g").agg(count(lit(1)).as("n")), "dropped_wedges")
    assert(out.columns.contains("dropped_wedges"))
    assert(col0(out.select("dropped_wedges").distinct()) === Seq(15L))
  }

  test("hub-skew wedge generation is bounded by the cap") {
    // a hub key with 50 members would emit C(50,2)=1225 wedges uncapped;
    // the cap bounds it at C(8,2)=28 and accounts for the other 1197
    val hub = (1 to 50).map(i => (99, i.toLong)).toDF("g", "id")
    val cap = Skew.capGroups(hub, Seq("g"), Seq(col("id")), 8)
    val basket = cap.kept.select(col("g"), col("id"))
    val wedges = basket.select(col("g"), col("id").as("a"))
      .join(basket.select(col("g"), col("id").as("b")), "g")
      .where(col("a") < col("b"))
    assert(wedges.count() === 28L)
    assert(col0(cap.droppedPairs()) === Seq(1225L - 28L))
  }

  test("Dedup LSH variants surface the cap through dropped_candidates") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    val idle = Dedup.minHashLsh(docs, "text", "doc_id",
      k = 16, bands = 4, shingleSize = 3, threshold = 0.5)
    assert(col0(idle.select("dropped_candidates").distinct()) === Seq(0L))
    // maxBucket=2 cannot hold the 3-way identical cluster in any band
    val fired = Dedup.minHashLsh(docs, "text", "doc_id",
      k = 16, bands = 4, shingleSize = 3, threshold = 0.5, maxBucket = 2)
    val drops = col0(fired.select("dropped_candidates").distinct())
    assert(drops.length === 1 && drops.head.asInstanceOf[Long] > 0L)
  }
}
