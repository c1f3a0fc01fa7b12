package graft

import org.apache.spark.sql.functions._

import graft.functions.Kernels
import graft.operators.Sampling

/** Deterministic sampling / splits (operators/Sampling.scala; gate
  * q83/q84). Pins the splitmix64 bucket kernel bit-for-bit, proves the
  * statistical contracts the ADVICE round demanded (seed independence),
  * and the split exhaustive/disjoint/null properties. Discipline analog
  * in the reference: test_sigrid_hash.py:48-66 pins its hash the same
  * way. */
class SamplingSpec extends SparkSpec {

  private def keys(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("k")
  }

  test("sampleBucket pins (splitmix64 of key + seed*golden64)") {
    // values cross-computed with exact big-integer arithmetic reduced
    // mod 2^64 (the same arithmetic the q83 DuckDB oracle replays)
    assert(Kernels.sampleBucket(0L, 0L) === 0) // splitmix64(0) == 0
    assert(Kernels.sampleBucket(1L, 0L) === 2770)
    assert(Kernels.sampleBucket(12345L, 42L) === 4343)
    assert(Kernels.sampleBucket(999999999L, 7L) === 762)
    assert(Kernels.sampleBucket(-5L, 3L) === 7229) // wrap-around key
    (0 until 1000).foreach { i =>
      val b = Kernels.sampleBucket(i.toLong * 7919L, 11L)
      assert(b >= 0 && b < Sampling.Buckets)
    }
  }

  test("buckets are stable across partitionings and engines-of-one") {
    val df = keys(5000)
    val a = df.select(col("k"), Sampling.bucket(col("k"), 42L).as("b"))
    val b = df.repartition(13, col("k"))
      .select(col("k"), Sampling.bucket(col("k"), 42L).as("b"))
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("distinct seeds give statistically independent samples") {
    // the round-9 ADVICE finding: under the old linear multiply-shift,
    // two 10% samples with different seeds overlapped 0 rows vs ~1%
    // expected. With the splitmix64 finalizer the overlap must sit in
    // a comfortable binomial band around n*0.01 (sd ≈ 31 at n=100k).
    val n = 100000
    val df = keys(n)
    def sample(seed: Long) =
      Sampling.bernoulli(df, col("k"), 0.1, seed).select("k")
    val s1 = sample(42L)
    val s2 = sample(4242L)
    val overlap = s1.join(s2, "k").count()
    assert(overlap > 600 && overlap < 1400,
      s"overlap $overlap outside [600, 1400] ≈ n/100 ± 13 sd")
    // and each sample is ~10% (floor(0.1*8192)/8192 of n ± noise)
    Seq(s1.count(), s2.count()).foreach { c =>
      assert(c > n / 10 - 1500 && c < n / 10 + 1500, s"sample size $c")
    }
  }

  test("bernoulli edge fractions: 0 selects nothing, 1 selects all") {
    val df = keys(1000)
    assert(Sampling.bernoulli(df, col("k"), 0.0, 7L).count() === 0)
    assert(Sampling.bernoulli(df, col("k"), 1.0, 7L).count() === 1000)
    // sub-granularity fraction floors to zero rows — documented edge
    assert(Sampling.bernoulli(df, col("k"), 0.5 / Sampling.Buckets, 7L)
      .count() === 0)
  }

  test("splitLabel is exhaustive, disjoint, and proportional") {
    val n = 20000
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = keys(n)
      .select(col("k"), Sampling.splitLabel(col("k"), weights, 7L).as("s"))
    // exhaustive: every non-null key gets exactly one non-null label
    assert(labeled.where(col("s").isNull).count() === 0)
    val counts = labeled.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === n.toLong)
    // proportional within a generous band (binomial sd ~ 42 for val)
    assert(math.abs(counts("train") - 16000L) < 500, counts.toString)
    assert(math.abs(counts("val") - 2000L) < 300, counts.toString)
    assert(math.abs(counts("test") - 2000L) < 300, counts.toString)
  }

  test("splitLabel and bernoulli agree on the same (key, seed) buckets") {
    // a 10% bernoulli (seed s) is exactly the keys whose bucket < 819;
    // splitting 0.1/0.9 with the same seed puts exactly those keys in
    // the first label — the two APIs are views of one assignment
    val df = keys(10000)
    val first = keys(10000)
      .select(col("k"),
        Sampling.splitLabel(col("k"), Seq("in" -> 0.1, "out" -> 0.9), 5L)
          .as("s"))
      .where(col("s") === "in").select("k")
    val bern = Sampling.bernoulli(df, col("k"), 0.1, 5L).select("k")
    assert(first.except(bern).count() === 0 &&
      bern.except(first).count() === 0)
  }

  test("null keys: never sampled, NULL split label") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("k")
    assert(Sampling.bernoulli(df, col("k"), 1.0, 7L).count() === 3)
    val lbl = df.select(Sampling.splitLabel(col("k"),
      Seq("a" -> 0.5, "b" -> 0.5), 7L).as("s"))
    assert(lbl.where(col("s").isNull).count() === 1)
    assert(lbl.where(col("s").isNotNull).count() === 3)
  }

  test("splitLabel survives weight sets whose cumulative shares " +
      "float-round above 1.0") {
    // 1/6/3/3: the shares sum to 1.0000000000000002 in IEEE double —
    // the discarded open-ended last cut must never reach threshold()'s
    // fraction <= 1.0 require
    val weights = Seq("a" -> 1.0, "b" -> 6.0, "c" -> 3.0, "d" -> 3.0)
    val labels = spark.range(0, 2000)
      .select(Sampling.splitLabel(col("id"), weights, 3L).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels.keySet === Set("a", "b", "c", "d"))
    assert(labels.values.sum === 2000L)
    // 20 equal weights is the other verified rounding case
    val many = (1 to 20).map(i => s"w$i" -> 0.05)
    val n = spark.range(0, 500)
      .select(Sampling.splitLabel(col("id"), many, 3L).as("s"))
      .where(col("s").isNotNull).count()
    assert(n === 500L)
  }

  test("splitLabel rejects sub-granularity weight shares") {
    val e = intercept[IllegalArgumentException] {
      Sampling.splitLabel(col("k"),
        Seq("big" -> 1.0, "tiny" -> 0.00001), 7L)
    }
    assert(e.getMessage.contains("zero rows"))
  }

  test("shuffleKey is the full hash behind bucket; shuffled is a " +
      "deterministic permutation and seeds are independent") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("k")
    // consistency: bucket == top 13 bits of the unsigned hash
    val mism = df.select(Sampling.bucket(col("k"), 5L).as("b"),
        Sampling.shuffleKey(col("k"), 5L).as("h"))
      .where(col("b") =!= shiftrightunsigned(col("h"), 51).cast("int"))
      .count()
    assert(mism === 0)
    // permutation: same rows, reproducible order
    val o1 = col0(Sampling.shuffled(df, col("k"), 17L))
    val o2 = col0(Sampling.shuffled(df, col("k"), 17L))
    assert(o1 === o2)
    assert(o1.toSet === (0L until 2000L).toSet)
    // a different seed yields a genuinely different permutation
    val o3 = col0(Sampling.shuffled(df, col("k"), 18L))
    assert(o1 !== o3)
    val agree = o1.zip(o3).count { case (a, b) => a == b }
    assert(agree < 20, s"seeds 17/18 agree on $agree of 2000 positions")
  }

  test("stratified applies per-stratum fractions deterministically") {
    import spark.implicits._
    val df = (0L until 10000L).map(k => (k, if (k % 2 == 0) "A" else "B"))
      .toDF("k", "g")
    val out = Sampling.stratified(df, col("g"), col("k"),
      Map("A" -> 0.5), default = 0.0, seed = 9L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("B")) // default 0 drops the other stratum
    assert(math.abs(byG("A") - 2500L) < 300, byG.toString)
    // re-running selects the identical rows
    val again = Sampling.stratified(df, col("g"), col("k"),
      Map("A" -> 0.5), default = 0.0, seed = 9L)
    assert(out.except(again).count() === 0)
  }

  test("mixToTarget hits the target mix at the largest achievable " +
      "total; the scarcest domain keeps everything") {
    import spark.implicits._
    // 6000 A, 3000 B, 1000 C; targets 50/25/25 -> C is scarcest:
    // T = min(6000/.5, 3000/.25, 1000/.25) = 4000 -> keep 2000 A
    // (1/3), 1000 B (1/3), all 1000 C
    val df = (0L until 10000L).map { k =>
      (k, if (k < 6000) "A" else if (k < 9000) "B" else "C")
    }.toDF("k", "g")
    val out = Sampling.mixToTarget(df, col("g"), col("k"),
      Map("A" -> 0.5, "B" -> 0.25, "C" -> 0.25), seed = 7L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("C") === 1000L, s"scarcest domain must keep all: $byG")
    assert(math.abs(byG("A") - 2000L) < 250, byG.toString)
    assert(math.abs(byG("B") - 1000L) < 180, byG.toString)
    // achieved shares ~ targets
    val tot = byG.values.sum.toDouble
    assert(math.abs(byG("A") / tot - 0.5) < 0.05, byG.toString)
    assert(math.abs(byG("B") / tot - 0.25) < 0.05, byG.toString)
  }

  test("mixToTarget keeps the scarcest domain in FULL even when its " +
      "recomputed fraction rounds below 1.0") {
    import spark.implicits._
    // 7 A, 1000 B with targets 0.3/0.7: t = 7/0.3 = 23.333...,
    // 0.3*t/7 = 0.9999999999999999 — without the argmin pin the floor
    // threshold would silently drop ~1/8192 of A
    val df = (0L until 1007L).map(k => (k, if (k < 7) "A" else "B"))
      .toDF("k", "g")
    for (seed <- 0L until 20L) {
      val byG = Sampling.mixToTarget(df, col("g"), col("k"),
        Map("A" -> 0.3, "B" -> 0.7), seed = seed)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byG("A") === 7L, s"seed $seed: scarcest domain lost rows")
    }
  }

  test("mixToTarget drops non-target domains, raises on absent " +
      "targets and bad shares") {
    import spark.implicits._
    val df = (0L until 100L).map(k => (k, if (k % 2 == 0) "A" else "X"))
      .toDF("k", "g")
    val out = Sampling.mixToTarget(df, col("g"), col("k"),
      Map("A" -> 1.0), seed = 7L)
    assert(out.where(col("g") =!= "A").count() === 0)
    assert(out.count() === 50L) // f = 1.0 keeps the whole domain
    val absent = intercept[IllegalArgumentException] {
      Sampling.mixToTarget(df, col("g"), col("k"),
        Map("A" -> 0.5, "Z" -> 0.5), seed = 7L)
    }
    assert(absent.getMessage.contains("'Z'"))
    val badSum = intercept[IllegalArgumentException] {
      Sampling.mixToTarget(df, col("g"), col("k"),
        Map("A" -> 0.5, "X" -> 0.2), seed = 7L)
    }
    assert(badSum.getMessage.contains("sum to 1"))
  }

  test("weightedBernoulli: boundary thresholds, monotonicity, " +
      "partition invariance, null policy") {
    import spark.implicits._
    val df = (0L until 2000L).map(k => (k, k % 100)).toDF("k", "w")
    def kept(thr: org.apache.spark.sql.Column, d: org.apache.spark.sql
        .DataFrame = df): Set[Long] =
      Sampling.weightedBernoulli(d, col("k"), thr, 11L)
        .select("k").collect().map(_.getLong(0)).toSet
    assert(kept(lit(0)) === Set.empty)
    assert(kept(lit(Sampling.Buckets)) === (0L until 2000L).toSet)
    // per-row thresholds: raising every weight only ADDS rows
    val lo = kept(expr(s"(w * ${Sampling.Buckets}) div 100"))
    val hi = kept(expr(s"(least(w + 20, 100) * ${Sampling.Buckets}) " +
      "div 100"))
    assert(lo.subsetOf(hi), s"monotonicity broken: ${lo -- hi}")
    // and a weight-0 row is NEVER kept (bucket >= 0 always)
    assert(!lo.exists(_ % 100 == 0))
    // deterministic under repartitioning
    val re = kept(expr(s"(w * ${Sampling.Buckets}) div 100"),
      df.repartition(7))
    assert(re === lo)
    // null threshold -> never kept
    val withNull = df.withColumn("t",
      when(col("k") < 1000L, lit(Sampling.Buckets)))
    assert(kept(col("t"), withNull) === (0L until 1000L).toSet)
  }
  test("mixByTemperature: alpha=1 is the identity, alpha=0 targets " +
      "uniform counts, alpha=0.5 lands shares proportional to sqrt(n)") {
    import spark.implicits._
    // 6400 A, 1600 B, 400 C — sqrt ratio 80:40:20 = 4:2:1
    val df = (0L until 8400L).map { k =>
      (k, if (k < 6400) "A" else if (k < 8000) "B" else "C")
    }.toDF("k", "g")
    def counts(alpha: Double): Map[String, Long] =
      Sampling.mixByTemperature(df, col("g"), col("k"), alpha, seed = 7L)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: every n/w ratio is 1 = the min, every fraction pins
    // to exactly 1.0 — the natural mixture at max size IS the corpus
    assert(counts(1.0) === Map("A" -> 6400L, "B" -> 1600L, "C" -> 400L))
    // alpha = 0: w = 1, m = min(n) = 400 — uniform counts, smallest
    // domain in full
    val u = counts(0.0)
    assert(u("C") === 400L, s"argmin domain must ride in full: $u")
    assert(math.abs(u("A") - 400L) < 90 && math.abs(u("B") - 400L) < 90,
      u.toString)
    // alpha = 0.5: f_A = sqrt(400/6400) = 1/4, f_B = sqrt(400/1600) =
    // 1/2, C full -> expected 1600/800/400 (shares 4:2:1)
    val h = counts(0.5)
    assert(h("C") === 400L, h.toString)
    assert(math.abs(h("A") - 1600L) < 220 && math.abs(h("B") - 800L) < 160,
      h.toString)
  }

  test("mixByTemperature drops null-label rows and rejects alpha " +
      "outside [0,1]") {
    import spark.implicits._
    val df = Seq((0L, "A"), (1L, "A"), (2L, null.asInstanceOf[String]))
      .toDF("k", "g")
    val out = Sampling.mixByTemperature(df, col("g"), col("k"),
      alpha = 1.0, seed = 7L)
    assert(out.count() === 2L && out.where(col("g").isNull).count() === 0)
    for (bad <- Seq(-0.1, 1.1)) {
      val e = intercept[IllegalArgumentException] {
        Sampling.mixByTemperature(df, col("g"), col("k"), bad, seed = 7L)
      }
      assert(e.getMessage.contains("outside [0,1]"))
    }
  }
}
