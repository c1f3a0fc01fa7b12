package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Functional

/** Distributed spherical k-means over an embedding column.
  *
  * The corpus-clustering primitive behind semantic dedup (SemDeDup,
  * Abbas et al. 2023), cluster-balanced mixture construction, and IVF
  * index building at full-corpus scale. [[Similarity.ivfTopK]] trains
  * its coarse quantizer on a bounded driver-side sample (standard IVF
  * practice — the quantizer only needs the density shape); THIS
  * operator is the full-data path: every Lloyd iteration is one
  * distributed scan, so the model reflects the whole corpus, not a
  * sample.
  *
  * Scale shape per iteration: assignment is a codegen'd kernel pass
  * against broadcast literal centroids (nCells × dim doubles — KBs);
  * the centroid update is a map-side partial aggregation on
  * (cell, dim) — the shuffle carries at most nCells × dim rows per
  * partition, never the vectors. Driver state is the nCells × dim
  * centroid matrix. Nothing else leaves the executors.
  *
  * Determinism: per-dimension sums go through DECIMAL(25,12) (embedding
  * components are unit-scale floats, so 13 integer digits cannot
  * overflow below ~10^12 rows per cell), making every fitted centroid —
  * and therefore every assignment — independent of partitioning and
  * aggregation order: `fit` is bit-reproducible across runs,
  * repartitionings, and cluster sizes, the same discipline as the
  * engine's dsum/q89 aggregates. Ties in the argmax assignment break
  * toward the lowest cell index (Kernels.nearestCell scans in order).
  *
  * Reference analog: torcharrow has no clustering surface — this is
  * part of the LLM-pipeline extension layer (SURVEY §2.14 north star),
  * kept deliberately minimal: k-means is the only clustering primitive
  * the dedup/mixing pipeline needs.
  */
object Clustering {

  /** Fit spherical k-means; returns flattened row-major normalized
    * centroids (nCells × dim), the literal form
    * [[Functional.nearestCell]] consumes.
    *
    * Init is deterministic farthest-first (Gonzalez 1985) over a
    * bounded sample in splitmix64-hash order (Sampling.shuffleKey
    * discipline — a reproducible pseudo-random sample, NOT the lowest
    * ids, which on id-ordered corpora would seed every centroid inside
    * one cluster and strand Lloyd in a merged local optimum). Empty
    * cells keep their previous centroid (standard Lloyd practice;
    * deterministic here because everything else is). For nCells beyond
    * ~10^4 the k-means|| init (Bahmani et al., VLDB 2012) is the
    * upgrade path; the iteration shape below is unchanged by it.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int,
      iters: Int = 5,
      initSample: Int = 4096): Array[Double] = {
    require(nCells > 0 && iters >= 0, s"nCells=$nCells iters=$iters")
    require(initSample >= nCells, s"initSample $initSample < nCells $nCells")
    // float-only contract, checked up front: the init collect
    // (getSeq[Float]) and the nearestCell kernel (getFloat) both read
    // array<float> — an array<double> column would fail deep inside a
    // task with a ClassCastException instead of this clear error
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"Clustering.fit: column '$vecCol' must be array<float>, " +
          s"got $other (cast double embeddings to float first)")
    }
    // Lloyd reads the vectors iters+1 times (init sample + every
    // iteration) — cache the projection once instead of re-scanning
    // the source each pass: at 100 TB that is `iters` fewer full
    // corpus scans (MEMORY_AND_DISK: spills rather than evicts, and
    // the projected (id, vec) frame is far smaller than the source).
    val vecs = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitCached(vecs, vecCol, idCol, nCells, iters, initSample)
    finally vecs.unpersist(blocking = false)
  }

  private def fitCached(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int,
      iters: Int,
      initSample: Int): Array[Double] = {
    // null vectors are legal rows (documented: null vector -> null
    // cell) — the distributed Lloyd pass drops them via posexplode,
    // and the driver-side init sample must too, or a null in the
    // first `initSample` hash-ordered rows NPEs with no diagnostic
    val sample = df
      .where(col(vecCol).isNotNull)
      .orderBy(Functional.sampleHash(col(idCol), 9L), col(idCol))
      .limit(initSample)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
      .map(normalize)
    require(sample.length >= nCells,
      s"corpus has ${sample.length} rows < nCells=$nCells")
    val dim = sample.head.length

    // farthest-first: start from the first sampled point, then greedily
    // take the point with the largest min-cosine-distance to the chosen
    // set (ties -> lowest sample index, so selection is deterministic)
    val chosen = new Array[Array[Double]](nCells)
    chosen(0) = sample(0)
    val minDist = sample.map(v => 1.0 - dot(v, chosen(0)))
    for (c <- 1 until nCells) {
      var bi = 0
      for (i <- sample.indices)
        if (minDist(i) > minDist(bi)) bi = i
      chosen(c) = sample(bi)
      for (i <- sample.indices) {
        val d = 1.0 - dot(sample(i), chosen(c))
        if (d < minDist(i)) minDist(i) = d
      }
    }
    var centroids: Array[Array[Double]] = chosen
    var prevObj = Double.NegativeInfinity

    for (it <- 0 until iters) {
      val centLit = lit(centroids.flatten)
      // One distributed pass: assign, then exact per-(cell, dim)
      // partial sums. The collect is bounded at nCells × dim rows.
      val stats = df
        .select(
          Functional.nearestCell(col(vecCol), centLit, dim).as("__cell"),
          posexplode(col(vecCol)))
        .groupBy(col("__cell"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(25, 12)))
          .cast(DoubleType).as("__s"))
        .collect()
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val seen = new Array[Boolean](nCells)
      stats.foreach { r =>
        val c = r.getInt(0)
        // non-ANSI mode turns a DECIMAL(25,12) overflow into a NULL sum
        // — name the cause instead of NPE-ing on getDouble
        if (r.isNullAt(2))
          throw new IllegalStateException(
            s"Clustering.fit: centroid sum overflowed DECIMAL(25,12) " +
              s"for cell $c dim ${r.getInt(1)} — embeddings must be " +
              "unit-scale floats (normalize or rescale upstream)")
        sums(c)(r.getInt(1)) = r.getDouble(2)
        seen(c) = true
      }
      // Lloyd-monotonicity self-check: the spherical objective after
      // the update step equals Σ_c ‖S_c‖ (the per-cell sums assigned
      // under the CURRENT centroids, scored against their optimal unit
      // replacement). Lloyd's algorithm guarantees this sequence is
      // non-decreasing — a decrease means a broken kernel or
      // aggregation, so fitting FAILS rather than returning a silently
      // wrong model. Tolerance covers the DECIMAL(25,12) rounding of
      // the sums.
      val obj = (0 until nCells).map(c =>
        if (seen(c)) math.sqrt(sums(c).map(x => x * x).sum) else 0.0).sum
      if (obj < prevObj - 1e-6 * math.max(1.0, prevObj))
        throw new IllegalStateException(
          s"Clustering.fit: spherical objective decreased at iteration " +
            s"$it ($prevObj -> $obj) — Lloyd monotonicity violated")
      prevObj = obj
      // spherical update: normalize(sum) == normalize(mean)
      centroids = Array.tabulate(nCells)(c =>
        if (seen(c)) normalize(sums(c)) else centroids(c))
    }
    centroids.flatten
  }

  /** Assignment column (cell index in [0, nCells)) for `vec` against a
    * fitted flattened centroid matrix. Null vector → null cell. */
  def assignment(vec: Column, centroidsFlat: Array[Double], dim: Int): Column =
    Functional.nearestCell(vec, lit(centroidsFlat), dim)

  /** Fit + assign in one call: (idCol, vecCol, cell). */
  def fitAssign(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCells: Int,
      iters: Int = 5): DataFrame = {
    val cents = fit(df, vecCol, idCol, nCells, iters)
    val dim = cents.length / nCells
    df.select(col(idCol), col(vecCol),
      assignment(col(vecCol), cents, dim).as("cell"))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v else v.map(_ / n)
  }
}
