package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the probe set is assumed small (queries) and is
  * broadcast — the corpus is never shuffled for brute force; each
  * partition scores its rows against the broadcast probes and a
  * partial top-k per probe survives to one final per-probe merge.
  * The LSH variant prunes the scan to matching buckets first and is
  * the 100 TB path (bucket column can be a partition/bucketing key of
  * the stored corpus, turning the probe into partition pruning).
  */
object Similarity {

  /** Brute-force cosine top-k: corpus × broadcast(probes), rank per
    * probe. Exact baseline. */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      probeIdCol: String,
      k: Int = 10): DataFrame = {
    val p = broadcast(probes.select(col(probeIdCol).as("probe_id"),
      col(vecCol).as("probe_vec")))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(p, col("id") =!= col("probe_id")) // broadcast nested loop
      .select(col("probe_id"), col("id"),
        Functional.cosineSim(col("v"), col("probe_vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a spherical k-means coarse quantizer
    * assigns every corpus vector to a cell; probes scan only their
    * `nProbe` nearest cells. The FAISS-style alternative scale path to
    * hyperplane LSH: cells adapt to the data distribution, and the
    * cell id is the natural partition/bucketing key for the stored
    * corpus (probing = partition pruning).
    *
    * Training runs driver-side on a bounded deterministic sample
    * (standard IVF practice — centroids are nCells×dim, tiny) and the
    * result is shipped to executors as a literal; assignment is a
    * single codegen'd kernel pass over the corpus.
    */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      probeIdCol: String,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      sampleSize: Int = 2048,
      iters: Int = 5): DataFrame = {
    // --- train: deterministic sample, Lloyd iterations, L2-normalize
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.length >= nCells, "sample smaller than nCells")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var centroids = Array.tabulate(nCells)(i =>
      normalize(sample(i * (sample.length / nCells)).map(_.toDouble)))
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      sample.foreach { v =>
        var bi = 0; var best = Double.NegativeInfinity
        for (c <- 0 until nCells) {
          var dot = 0.0
          for (i <- 0 until dim) dot += centroids(c)(i) * v(i)
          if (dot > best) { best = dot; bi = c }
        }
        for (i <- 0 until dim) sums(bi)(i) += v(i)
        counts(bi) += 1
      }
      centroids = Array.tabulate(nCells)(c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c)))
    }
    val centLit = lit(centroids.flatten)

    // --- assign corpus cells (one kernel pass; at rest this column is
    // the partitioning key) and explode probes to their nProbe cells
    val cb = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      Functional.nearestCell(col(vecCol), centLit, dim).as("cell"))
    val pb = broadcast(probes.select(col(probeIdCol).as("probe_id"),
        col(vecCol).as("probe_vec"),
        explode(Functional.nearestCells(col(vecCol), centLit, dim, nProbe))
          .as("cell")))
    val scored = cb.join(pb, Seq("cell"))
      .where(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        Functional.cosineSim(col("v"), col("probe_vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** LSH-bucketed ANN: only corpus rows whose hyperplane bucket matches
    * a probe bucket (or a 1-bit neighbor, for recall) are scored. */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      vecCol: String,
      idCol: String,
      probeIdCol: String,
      k: Int = 10,
      bits: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      Functional.hyperplaneLsh(col(vecCol), bits).as("bucket"))
    // probe explodes to its own bucket + all 1-bit-flip neighbors
    val pb = broadcast(probes.select(col(probeIdCol).as("probe_id"),
        col(vecCol).as("probe_vec"),
        Functional.hyperplaneLsh(col(vecCol), bits).as("b0"))
      .select(col("probe_id"), col("probe_vec"),
        explode(concat(array(col("b0")),
          transform(sequence(lit(0), lit(bits - 1)),
            i => col("b0").bitwiseXOR(call_function("shiftleft", lit(1L), i)))))
          .as("bucket")))
    val scored = cb.join(pb, Seq("bucket"))
      .where(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        Functional.cosineSim(col("v"), col("probe_vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
