package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functional

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * A 100 TB corpus is sampled by a pure function of a stable key, never
  * by `rand()`: the sample must be reproducible across runs, engines,
  * and partitionings (re-running the pipeline after adding a column
  * must select the SAME documents). The assignment is a multiply-shift
  * hash (Dietzfelbinger et al., "A reliable randomized algorithm for
  * the closest-pair problem", J. Algorithms 1997): bucket(key) = top
  * [[BucketBits]] bits of `(key + seed) * A` mod 2^64 with A odd —
  * the high bits are well-mixed even for sequential keys (the low bits
  * of a mod-2^64 LCG are periodic, which is why the shift takes the
  * TOP bits). The arithmetic is plain 64-bit wrap-around multiply +
  * unsigned shift, so any engine with 64-bit integers (or 128-bit
  * exact arithmetic reduced mod 2^64) computes the identical bucket —
  * the DuckDB oracle reproduces it with HUGEINT.
  *
  * Scale shape: a sample/split is a stateless per-row filter/project on
  * the scan — no shuffle, no state, fully codegen'd, survives any
  * repartitioning. Reference analog: torcharrow exposes only
  * `functional.rand` (velox_functional_.py) — reproducible sampling is
  * part of the pipeline surface this engine adds on top.
  */
object Sampling {

  /** log2 of the bucket space; 8192 buckets → fraction granularity
    * 1/8192 ≈ 0.012%. A power of two so that signed-vs-unsigned mod
    * agrees between JVM longs and exact big-integer arithmetic. */
  val BucketBits = 13
  val Buckets: Int = 1 << BucketBits

  /** Fixed odd multiplier: the 64-bit golden ratio 0x9E3779B97F4A7C15
    * (as used by splitmix64's increment; public constant). */
  val Multiplier: Long = 0x9E3779B97F4A7C15L

  /** Deterministic bucket in [0, Buckets) for an integral key. The
    * wrap-around multiply lives in a Java kernel (Kernels.sampleBucket,
    * codegen'd via StaticInvoke): under ANSI mode, Column arithmetic
    * would raise on the intended mod-2^64 overflow. */
  def bucket(key: Column, seed: Long): Column =
    Functional.sampleBucket(key, seed)

  /** Threshold for a fraction: buckets `< threshold(f)` are selected,
    * so the realized fraction is `floor(f * Buckets) / Buckets`. */
  def threshold(fraction: Double): Int = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    math.floor(fraction * Buckets).toInt
  }

  /** Keep a deterministic `fraction` of rows, keyed by `key`. */
  def bernoulli(df: DataFrame, key: Column, fraction: Double,
      seed: Long): DataFrame =
    df.where(bucket(key, seed) < lit(threshold(fraction)))

  /** Stratified deterministic sample: per-stratum fractions, with
    * `default` for strata absent from the map. The fraction lookup is
    * a literal when-chain (codegen'd, no join) — strata cardinality is
    * assumed small (it is a label column, not a key column). */
  def stratified(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double], default: Double,
      seed: Long): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(default))) {
      case (acc, (label, f)) =>
        when(strata === lit(label), lit(threshold(f))).otherwise(acc)
    }
    df.where(bucket(key, seed) < thr)
  }

  /** Deterministic train/val/test-style split label: `weights` are
    * (label, weight) pairs; each key lands in exactly one label, with
    * proportions `weight / sum(weights)`. Exhaustive and disjoint by
    * construction (half-open bucket ranges covering [0, Buckets)). */
  def splitLabel(key: Column, weights: Seq[(String, Double)],
      seed: Long): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total
    }.tail.map(threshold)
    val b = bucket(key, seed)
    // last range is open-ended so rounding never drops a row
    weights.init.zip(cuts.init).reverse.foldLeft(
      lit(weights.last._1)) { case (acc, ((label, _), cut)) =>
      when(b < lit(cut), lit(label)).otherwise(acc)
    }
  }
}
