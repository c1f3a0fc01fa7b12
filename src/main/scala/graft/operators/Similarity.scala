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
            i => col("b0").bitwiseXOR(pow(lit(2.0), i).cast("long")))))
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
