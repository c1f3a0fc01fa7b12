package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join — the skew playbook for keys too hot for one task.
  *
  * A shuffle join partitions by the join key, so a key holding 30% of
  * a 100 TB fact table lands 30 TB on one task: the straggler that
  * defines the job's wall clock. Salting splits it: the big side
  * scatters each row into one of `nSalts` sub-keys (a deterministic
  * hash of a caller-chosen stable column — NOT rand(), so re-runs are
  * identical); the small side replicates each row `nSalts` times; the
  * join runs on (key, salt). Inner-join semantics are EXACTLY
  * preserved — each big-side row still meets every matching small-side
  * row, exactly once — while the hot key's work spreads over `nSalts`
  * tasks.
  *
  * When to reach for it: AQE's skew-join split
  * (spark.sql.adaptive.skewJoin) handles sort-merge skew at runtime
  * and should be the first resort; explicit salting remains the tool
  * when the skew is known ahead of time, when the join is a
  * shuffled-hash join AQE won't split, or when the salt count must be
  * sized deliberately (e.g. a boilerplate dedup bucket known to hold
  * half the corpus). The small side grows `nSalts`-fold — size it so
  * replicated-small still fits comfortably in the shuffle (it is a
  * dimension table; that is the premise of the pattern).
  */
object Salting {

  /** Inner-join `big` with `small` on `key`, scattering the big side
    * into `nSalts` sub-keys by `saltBy` (a stable per-row expression,
    * e.g. the table's unique id — determinism of the scatter makes the
    * run reproducible; the RESULT is identical for any scatter). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts=$nSalts")
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column — " +
        "it would be silently overwritten; rename it first")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(nSalts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
