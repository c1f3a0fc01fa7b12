package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-bounding primitives for group-explosion operators.
  *
  * Every self-join / bucket-join candidate generator in this engine
  * (MinHash-LSH, SimHash, winnowing, embedding-LSH buckets, graph
  * wedge generation) has the same failure mode at 100 TB: one skewed
  * group (a boilerplate cluster, a hub customer) turns the confined
  * quadratic step into an all-pairs blow-up — candidate rows scale as
  * Σ deg(g)². The discipline, shared here so gates compose it instead
  * of re-deriving it (round-12 verdict item 6):
  *
  *   1. rank rows within each group by a DETERMINISTIC order,
  *   2. keep only the first `maxPerKey` per group,
  *   3. ACCOUNT for what the cap removed — either dropped group
  *      memberships ([[Capped.droppedRows]], the Dedup
  *      `dropped_candidates` contract) or dropped within-group pairs
  *      ([[Capped.droppedPairs]], wedge accounting) — as a 1-row
  *      broadcastable frame, never a silent truncation.
  *
  * Scale: one shuffle on the group keys for the rank window; the
  * drop-count branch reuses that exchange (same partitioning) and
  * reduces to a single row before the broadcast cross join. Capped
  * group size bounds the downstream join at maxPerKey² per group.
  */
object Skew {

  /** Result of [[capGroups]]: `kept` is the input limited to
    * `maxPerKey` rows per group (plus the internal `__rn` rank, which
    * downstream selects drop naturally); `ranked` is the full input
    * with `__rn`, for drop accounting. */
  final case class Capped(
      kept: DataFrame, ranked: DataFrame,
      keys: Seq[String], maxPerKey: Int) {

    /** 1-row frame: how many group memberships the cap removed
      * (0 when it never fired). */
    def droppedRows(name: String = "dropped_candidates"): DataFrame =
      ranked.where(col("__rn") > maxPerKey)
        .agg(count(lit(1)).as(name))

    /** 1-row frame: how many within-group unordered pairs the cap
      * removed — Σ over capped groups of C(d,2) − C(maxPerKey,2).
      * This is the honest number for wedge/self-join generators where
      * the OUTPUT is pairs, not memberships. */
    def droppedPairs(name: String = "dropped_pairs"): DataFrame = {
      val d = col("d")
      // d·(d−1) − k·(k−1) is even and non-negative (d > maxPerKey on
      // the branch that uses it), so a right shift halves it EXACTLY
      // in long arithmetic. Spark's `/` on longs returns DOUBLE, which
      // loses integer exactness past 2^53 — precisely the hub-group
      // regime this accounting exists for.
      val lost = shiftright(
        d * (d - 1) - lit(maxPerKey.toLong) * (maxPerKey - 1), 1)
      ranked.groupBy(keys.map(col): _*)
        .agg(max(col("__rn")).cast("long").as("d"))
        .select(when(d > maxPerKey, lost).otherwise(0L).as("p"))
        .agg(coalesce(sum(col("p")), lit(0L)).cast("long").as(name))
    }

    /** Attach a drop count to `result` as a constant column via a
      * broadcast cross join (the Dedup `withDropCount` shape). */
    def attachDroppedRows(
        result: DataFrame,
        name: String = "dropped_candidates"): DataFrame =
      result.crossJoin(broadcast(droppedRows(name)))

    def attachDroppedPairs(
        result: DataFrame,
        name: String = "dropped_pairs"): DataFrame =
      result.crossJoin(broadcast(droppedPairs(name)))
  }

  /** Deterministically cap rows per group: rank within each `keys`
    * group by `order` (must be a total order within the group for
    * engine-portable results — an id column, not a payload), keep
    * ranks ≤ `maxPerKey`. */
  def capGroups(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      maxPerKey: Int): Capped = {
    require(maxPerKey > 0, s"maxPerKey must be positive: $maxPerKey")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val ranked = df.withColumn("__rn", row_number().over(w))
    Capped(ranked.where(col("__rn") <= maxPerKey), ranked,
      keys, maxPerKey)
  }
}
