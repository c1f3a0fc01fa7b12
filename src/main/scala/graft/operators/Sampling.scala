package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functional

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * A 100 TB corpus is sampled by a pure function of a stable key, never
  * by `rand()`: the sample must be reproducible across runs, engines,
  * and partitionings (re-running the pipeline after adding a column
  * must select the SAME documents). The assignment is the top
  * [[BucketBits]] bits of the splitmix64 finalizer (Steele, Lea &
  * Flood, OOPSLA 2014) applied to `key + seed * golden64`
  * (Kernels.sampleBucket). The nonlinear xor-shift-multiply rounds
  * make distinct seeds statistically independent — with a bare
  * multiply-shift, a seed change is a pure rotation of the bucket
  * space, so two samples under different seeds would be near-identical
  * or near-disjoint. The arithmetic is plain 64-bit wrap-around
  * multiply/xor/shift, so any engine with 64-bit integers (or exact
  * wide arithmetic reduced mod 2^64) computes the identical bucket —
  * the q83 DuckDB oracle replays it with HUGEINT/UBIGINT.
  *
  * Null policy: a null key hashes to a null bucket, so null-key rows
  * are NEVER selected by [[bernoulli]]/[[stratified]] (a null
  * comparison is never true) and get a NULL label from [[splitLabel]].
  * Sample keys must be non-null for proportional semantics; filter or
  * coalesce first if nulls are meaningful.
  *
  * Scale shape: a sample/split is a stateless per-row filter/project on
  * the scan — no shuffle, no state, fully codegen'd, survives any
  * repartitioning. Reference analog: torcharrow exposes only
  * `functional.rand` (velox_rt/functional.py:47-63) — reproducible
  * sampling is part of the pipeline surface this engine adds on top.
  */
object Sampling {

  /** log2 of the bucket space; 8192 buckets → fraction granularity
    * 1/8192 ≈ 0.012%. A power of two so that signed-vs-unsigned mod
    * agrees between JVM longs and exact big-integer arithmetic. */
  val BucketBits = 13
  val Buckets: Int = 1 << BucketBits

  /** Seed-mixing multiplier: the 64-bit golden ratio 0x9E3779B97F4A7C15
    * (splitmix64's increment; public constant). */
  val Multiplier: Long = 0x9E3779B97F4A7C15L

  /** Deterministic bucket in [0, Buckets) for an integral key; null key
    * → null bucket. The wrap-around arithmetic lives in a Java kernel
    * (Kernels.sampleBucket, codegen'd via StaticInvoke): under ANSI
    * mode, Column arithmetic would raise on the intended mod-2^64
    * overflow. */
  def bucket(key: Column, seed: Long): Column =
    Functional.sampleBucket(key, seed)

  /** Threshold for a fraction: buckets `< threshold(f)` are selected,
    * so the realized fraction is `floor(f * Buckets) / Buckets` — any
    * fraction below 1/Buckets (≈ 0.012%) floors to threshold 0 and
    * selects ZERO rows. Callers needing finer granularity should widen
    * [[BucketBits]] (and the q83 oracle) rather than scale fractions. */
  def threshold(fraction: Double): Int = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    math.floor(fraction * Buckets).toInt
  }

  /** Keep a deterministic `fraction` of rows, keyed by `key`. Null-key
    * rows are never kept (see the null policy above); fractions below
    * 1/Buckets select zero rows (see [[threshold]]). */
  def bernoulli(df: DataFrame, key: Column, fraction: Double,
      seed: Long): DataFrame =
    df.where(bucket(key, seed) < lit(threshold(fraction)))

  /** Per-row WEIGHTED deterministic Bernoulli (importance/quality
    * weighting — the DSIR/CCNet resampling step): keep a row iff
    * bucket(key, seed) < `thr`, where `thr` is a per-row integer
    * threshold in [0, Buckets] the caller derives in EXACT integer
    * arithmetic (e.g. `(weight_num * Buckets) div weight_den` for a
    * rational weight — never a double product, whose rounding could
    * shift a threshold by one bucket and diverge between engines).
    * Inclusion probability is thr/Buckets per row; like every sampler
    * here it is a stateless codegen'd filter — no shuffle, no rand(),
    * reproducible under any partitioning and replayable in any engine
    * with 64-bit integers. Null key or null threshold → never kept. */
  def weightedBernoulli(df: DataFrame, key: Column, thr: Column,
      seed: Long): DataFrame =
    df.where(bucket(key, seed) < thr)

  /** Stratified deterministic sample: per-stratum fractions, with
    * `default` for strata absent from the map. The fraction lookup is
    * a literal when-chain (codegen'd, no join) — strata cardinality is
    * assumed small (it is a label column, not a key column). Null-key
    * rows are never kept. */
  def stratified(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double], default: Double,
      seed: Long): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(default))) {
      case (acc, (label, f)) =>
        when(strata === lit(label), lit(threshold(f))).otherwise(acc)
    }
    df.where(bucket(key, seed) < thr)
  }

  /** Rebalance a corpus to target domain proportions (the data-mixture
    * step of a training pipeline: language mixing, source weighting):
    * given `targets` (domain → share; shares must sum to ~1), find the
    * largest achievable total T that oversamples no domain —
    * T = min_d(n_d / p_d) — and keep a deterministic
    * min(1, p_d·T/n_d) fraction of each target domain via
    * [[stratified]]. Domains outside `targets` are dropped (fraction
    * 0); a target domain with zero rows raises (the requested mixture
    * is unachievable) rather than silently emitting an empty corpus.
    *
    * Realized counts inherit [[threshold]]'s floor(f·8192)/8192
    * granularity; the q106 oracle recomputes T, the per-domain
    * thresholds, and the splitmix64 buckets in DuckDB, so the whole
    * chain is pinned engine-portable.
    *
    * Scale shape: one label-cardinality counts aggregate collected to
    * the driver (domains are a label column, not a key column), then
    * the same stateless per-row filter as every sampler here — the
    * corpus itself is never shuffled. */
  def mixToTarget(df: DataFrame, strata: Column, key: Column,
      targets: Map[String, Double], seed: Long): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "mixToTarget: target shares must be positive")
    val tot = targets.values.sum
    require(math.abs(tot - 1.0) < 1e-6,
      s"mixToTarget: target shares must sum to 1 (got $tot)")
    val counts = domainCounts(df, strata)
    targets.keys.foreach { d =>
      require(counts.getOrElse(d, 0L) > 0L,
        s"mixToTarget: target domain '$d' has no rows — the requested " +
          "mixture is unachievable")
    }
    mixByWeights(df, strata, key, counts, targets, seed)
  }

  /** One label-cardinality counts aggregate shared by the mixture
    * samplers (domains are a label column, not a key column); null
    * strata drop — no domain, no share. */
  private def domainCounts(df: DataFrame,
      strata: Column): Map[String, Long] =
    df.where(strata.isNotNull)
      .groupBy(strata.cast(org.apache.spark.sql.types.StringType)
        .as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Shared realization of the weighted-mixture samplers
    * ([[mixToTarget]] w = target share, [[mixByTemperature]]
    * w = n^alpha): keep fraction f_d = min(1, w_d·m/n_d) with
    * m = min_d(n_d/w_d) — the largest duplication-free corpus whose
    * domain shares are exactly ∝ w. The argmin domain pins to exactly
    * 1.0: computing its fraction as w·(n/w)/n would round to
    * 0.99999... and floor away a bucket, so fp-equality on the SAME
    * n/w expression that produced the min keeps it whole (the
    * q106/q281 oracles replay the same CASE). Domains without a
    * weight drop (fraction 0 via stratified's default). */
  private def mixByWeights(df: DataFrame, strata: Column, key: Column,
      counts: Map[String, Long], w: Map[String, Double],
      seed: Long): DataFrame = {
    val m = w.map { case (d, wd) => counts(d) / wd }.min
    val fractions = w.map { case (d, wd) =>
      d -> (if (counts(d) / wd == m) 1.0
            else math.min(1.0, wd * m / counts(d)))
    }
    stratified(df, strata, key, fractions, default = 0.0, seed)
  }

  /** Temperature-scaled domain mixture (the multilingual-corpus
    * rebalancing rule of XLM-R/mT5: sample domain d with probability
    * q_d ∝ p_d^alpha, alpha in [0,1] — alpha=1 keeps natural
    * proportions, alpha=0 is uniform, alpha≈0.3-0.7 boosts
    * low-resource domains): realized WITHOUT duplication as the
    * largest corpus whose domain shares are exactly q — every domain
    * keeps fraction f_d = min(1, w_d·m/n_d) with w_d = n_d^alpha and
    * m = min_d(n_d/w_d), the smallest-w_d-ratio domain riding in full.
    * The algebra is deliberate: the textbook q_d = w_d/Σw_j needs an
    * order-sensitive float SUM, but the normalizer cancels inside
    * f_d, leaving only per-domain pow/division and a MIN — every step
    * an order-independent IEEE expression an external oracle replays
    * bit-for-bit (the one cross-engine trust point is pow itself,
    * pinned by the gate at both verify SFs and the replica corpus).
    * The argmin domain's fraction is pinned to exactly 1.0 by the
    * same fp-equality-on-the-min-expression rule as [[mixToTarget]].
    *
    * Scale shape identical to [[mixToTarget]]: one label-cardinality
    * counts aggregate to the driver, then the stateless splitmix64
    * row filter — the corpus never shuffles. Rows with null strata
    * are dropped (no domain, no share). */
  def mixByTemperature(df: DataFrame, strata: Column, key: Column,
      alpha: Double, seed: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"mixByTemperature: alpha=$alpha outside [0,1]")
    val counts = domainCounts(df, strata)
    require(counts.nonEmpty,
      "mixByTemperature: no non-null domain labels in the corpus")
    val w = counts.map { case (d, n) =>
      d -> math.pow(n.toDouble, alpha)
    }
    mixByWeights(df, strata, key, counts, w, seed)
  }

  /** Deterministic global-shuffle key: the full 64-bit splitmix64
    * value behind [[bucket]] (signed comparison order). ORDER BY this
    * column is a reproducible, engine-portable permutation of the
    * corpus — the training-data shuffle, without `rand()`: re-running
    * the pipeline yields the identical order, and two seeds give
    * statistically independent permutations. */
  def shuffleKey(key: Column, seed: Long): Column =
    Functional.sampleHash(key, seed)

  /** Deterministically shuffled frame: global sort by
    * ([[shuffleKey]], key) — the key tiebreak makes the permutation
    * total even under (astronomically unlikely) hash collisions. At
    * scale this is Spark's range-partitioned sort: one sampling pass
    * to pick range bounds, one shuffle — the standard way to lay out
    * a training corpus in shuffled order. */
  def shuffled(df: DataFrame, key: Column, seed: Long): DataFrame =
    df.orderBy(shuffleKey(key, seed), key)

  /** Deterministic train/val/test-style split label: `weights` are
    * (label, weight) pairs; each non-null key lands in exactly one
    * label, with proportions `weight / sum(weights)`; a null key gets
    * a NULL label (never silently the last label). Exhaustive and
    * disjoint over non-null keys by construction (half-open bucket
    * ranges covering [0, Buckets)); every normalized weight share must
    * be >= 1/Buckets so no slice floors to an empty bucket range. */
  def splitLabel(key: Column, weights: Seq[(String, Double)],
      seed: Long): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    weights.foreach { case (label, w) =>
      require(w / total >= 1.0 / Buckets,
        s"weight share for '$label' (${w / total}) is below 1/$Buckets " +
          "and would select zero rows")
    }
    // the FINAL cumulative cut is discarded (the last range is
    // open-ended) — map threshold() over the kept prefix only: the
    // discarded cut floating-point rounds above 1.0 for many valid
    // weight sets (e.g. 1/6/3/3 sums to 1.0000000000000002) and would
    // trip threshold's fraction <= 1.0 require
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total
    }.tail.init.map(threshold)
    val b = bucket(key, seed)
    // last range is open-ended so rounding never drops a row
    val chain = weights.init.zip(cuts).reverse.foldLeft(
      lit(weights.last._1)) { case (acc, ((label, _), cut)) =>
      when(b < lit(cut), lit(label)).otherwise(acc)
    }
    when(b.isNull, lit(null: String)).otherwise(chain)
  }
}
