package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Bounded-size probabilistic sketches — the operations that replace
  * exact shuffles at 100 TB:
  *
  *  - HLL distinct counts ([[approxDistinct]]): one scan, map-side
  *    partial merge of fixed-size registers, no shuffle of values —
  *    where an exact distinct would shuffle every distinct key.
  *  - Bloom semi-join prefilter ([[bloomPrefilter]]): the explicit
  *    form of Spark's runtime row-group filters — build a bounded
  *    binary sketch over the key side, probe the fact side with a
  *    codegen'd literal. False negatives impossible (every true match
  *    survives); false positives bounded by fpp and removed by the
  *    exact join that follows.
  *  - Count-Min heavy-hitter counts ([[cmsCounts]]): fixed-size
  *    counter grid, estimates never undercount and overcount by at
  *    most eps·N with the sketch's confidence.
  *
  * All three are deterministic for fixed inputs and seeds (HLL and
  * bloom are seed-free; CMS takes an explicit seed), so gates can pin
  * their error bounds exactly.
  */
object Sketches {

  /** Per-group HLL distinct counts: groupBy(groupCols).agg(HLL(value)).
    * `rsd` is the target relative standard deviation; estimates are
    * deterministic and partition-order-invariant (register max-merge
    * commutes). */
  def approxDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double, out: String = "nd_approx"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(out))

  /** Build a bloom sketch over `keyCol` of `keys`, sized for
    * `expectedItems` at false-positive rate `fpp`. The aggregate runs
    * distributed (partial sketches OR-merge); only the final
    * numBits-bounded binary reaches the driver. */
  def bloomSketch(
      keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"bloomSketch: expectedItems must be " +
      s"positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"bloomSketch: fpp must be in (0,1), " +
      s"got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate silently CLAMPS to these session confs
    // (rather than erroring), which would leave the sketch far above
    // the requested fpp — fail loudly instead of degrading silently.
    val conf = keys.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000")
      .toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864")
      .toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloomSketch: expectedItems=$expectedItems needs $numBits bits " +
        s"at fpp=$fpp, above the aggregate's clamp " +
        s"(maxNumItems=$maxItems, maxNumBits=$maxBits) — the sketch " +
        "would be silently undersized; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
        "or accept a larger fpp")
    val r = keys
      .select(Shim.bloomAgg(xxhash64(col(keyCol)), expectedItems, numBits)
        .as("bf"))
      .head()
    require(!r.isNullAt(0),
      "bloomSketch: empty key side — the aggregate returned no sketch")
    r.getAs[Array[Byte]](0)
  }

  /** Semi-join prefilter: keep the fact rows whose `factKey` MIGHT be
    * in `keys`. The scale pattern for fact-x-dim filtering when the
    * dim is too big to broadcast as a hash relation but its bloom
    * sketch is not: the probe is a pure codegen'd expression on the
    * fact scan (no shuffle, no join), and the exact join that follows
    * runs over the pre-shrunk fact side. */
  def bloomPrefilter(
      fact: DataFrame, factKey: String,
      keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = bloomSketch(keys, keyCol, expectedItems, fpp)
    fact.where(Shim.bloomMightContain(sketch, xxhash64(col(factKey))))
  }

  /** Count-Min sketch of a string column's value counts (distributed
    * build, driver-merged fixed-size grid). Estimates obey
    * true <= est <= true + eps·N with the sketch's confidence. */
  def cmsCounts(
      df: DataFrame, valueCol: String, eps: Double, confidence: Double,
      seed: Int): CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, confidence, seed)

  /** Exact frequent items above a `theta` frequency threshold, found
    * WITHOUT a full-domain groupBy — the two-pass candidate pattern
    * for heavy hitters over an unbounded key domain:
    *
    *  1. Candidate pass: each partition counts locally and emits only
    *     the keys with local count >= theta * localRows. By the
    *     averaging argument, any key with global count >= theta * N
    *     clears the local threshold in AT LEAST one partition (if
    *     every partition had count_p < theta * n_p, summing gives
    *     count < theta * N) — so the candidate set is a guaranteed
    *     superset of the true heavy hitters, and it is bounded:
    *     <= 1/theta keys per partition survive the local filter.
    *  2. Exact pass: recount ONLY the candidate keys (broadcast
    *     semi-join on the scan) and keep those with count >= theta*N.
    *
    * At 100 TB the win is the shuffle: pass 1 shuffles <=
    * partitions/theta candidate KEYS, pass 2 shuffles only rows
    * matching candidates — the full key domain is never aggregated.
    * Returns (keyCol, n) exact counts, no approximation in the output.
    * Null keys are ignored. The local maps are per-partition
    * distinct-key-bounded; the documented upgrade for adversarial
    * per-partition cardinality is a SpaceSaving buffer at capacity
    * ceil(1/theta), which preserves the same superset guarantee. */
  def heavyHitters(df: DataFrame, keyCol: String, theta: Double)
      : DataFrame = {
    require(theta > 0 && theta <= 1,
      s"heavyHitters: theta must be in (0,1], got $theta")
    import scala.jdk.CollectionConverters._
    val keys = df.select(col(keyCol).cast(StringType).as(keyCol))
      .where(col(keyCol).isNotNull)
    // one pass emits BOTH the local-threshold candidates and the
    // per-partition row totals (sentinel rows with a null key — safe,
    // real keys were filtered non-null above), so the global N needs
    // no extra corpus scan. The pass output is bounded: <= 1/theta
    // candidates + 1 sentinel per partition — cheap to cache for its
    // two consumers (total, candidate set).
    val pass1 = keys
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Long]
        var n = 0L
        it.foreach { k =>
          n += 1
          m.merge(k, 1L, (a, b) => a + b)
        }
        val thr = theta * n
        Iterator.single((null: String, n)) ++
          m.entrySet().iterator().asScala
            .filter(_.getValue >= thr).map(e => (e.getKey, 0L))
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF(keyCol, "__np")
      .cache()
    val total = pass1.where(col(keyCol).isNull)
      .agg(coalesce(sum(col("__np")), lit(0L)).as("t"))
      .head().getLong(0)
    // drain the cache EAGERLY (the candidate set is bounded at
    // <= partitions/theta by the averaging argument, so the collect is
    // safe) and unpersist before returning — the lazy-DataFrame
    // alternative would leak one cached frame per call for the session
    // lifetime
    val candidates = pass1.where(col(keyCol).isNotNull)
      .select(col(keyCol)).distinct()
      .collect().map(_.getString(0)).toSeq
    pass1.unpersist()
    val spark = df.sparkSession
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    val candDf = candidates.toDF(keyCol)
    keys.join(broadcast(candDf), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= lit(theta) * lit(total))
  }
}
