package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup}

/** Distributed spherical k-means (operators/Clustering.scala; gate
  * q91_semdedup). Proves cluster recovery on separable data, the
  * decimal-exact determinism contract (identical centroids under any
  * repartitioning), and the SemDeDup twin guarantee. */
class ClusteringSpec extends SparkSpec {

  /** 3 well-separated clusters in 8-dim: each lives on its own axis
    * pair with a small deterministic jitter on the remaining dims. */
  private def separable(perCluster: Int = 20) = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until perCluster
    } yield {
      val v = Array.fill(8)(0.0f)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = 0.5f
      v(7) = (i % 5) * 0.01f // jitter, far below the cluster separation
      ((c * perCluster + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("k-means recovers planted separable clusters with purity 1.0") {
    val df = separable()
    val assigned = Clustering.fitAssign(df, "embedding", "vec_id",
      nCells = 3, iters = 5)
    // every ground-truth cluster (vec_id / 20) maps to exactly one cell
    // and no two clusters share a cell
    val m = assigned
      .select((col("vec_id") / 20).cast("int").as("truth"), col("cell"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(m.length === 3, s"expected a 1:1 truth->cell map, got ${m.toSeq}")
    assert(m.map(_._2).distinct.length === 3)
  }

  test("a null vector among the init sample rows does not crash fit " +
      "(null vector -> null cell is the documented contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    val base = (0 until 60).map(i =>
      (i.toLong, Array.fill(4)(((i % 3) * 10 + 1).toFloat)))
      .toDF("id", "vec")
    val withNull = base.withColumn("vec",
      when(col("id") === 7L, lit(null)).otherwise(col("vec")))
    val assigned = Clustering.fitAssign(withNull, "vec", "id",
      nCells = 3, iters = 3)
    assert(assigned.where(col("id") === 7L).head().isNullAt(
      assigned.columns.indexOf("cell")))
    assert(assigned.where(col("cell").isNotNull).count() === 59L)
  }

  test("fit is bit-deterministic across repartitionings") {
    val df = separable(30)
    val a = Clustering.fit(df, "embedding", "vec_id", nCells = 3, iters = 4)
    val b = Clustering.fit(df.repartition(13), "embedding", "vec_id",
      nCells = 3, iters = 4)
    val c = Clustering.fit(df.repartition(2), "embedding", "vec_id",
      nCells = 3, iters = 4)
    // decimal-exact sums: identical DOUBLES, not just close
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
  }

  test("assignment is total and in range; empty cells keep centroids") {
    val df = separable()
    // nCells = 5 > 3 real clusters: at least 2 cells may end up empty —
    // fit must still return 5 finite unit centroids
    val cents = Clustering.fit(df, "embedding", "vec_id", nCells = 5,
      iters = 3)
    assert(cents.length === 5 * 8)
    assert(cents.forall(x => !x.isNaN && !x.isInfinite))
    val cells = Clustering.fitAssign(df, "embedding", "vec_id", 5, 3)
      .select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 5))
  }

  test("semantic dedup always pairs identical vectors (twin guarantee)") {
    import spark.implicits._
    val twins = Seq(
      (1000L, Seq.fill(8)(0.3f)),
      (1001L, Seq.fill(8)(0.3f))).toDF("vec_id", "embedding")
    val corpus = separable().unionByName(twins)
    val pairs = Dedup.semantic(corpus, "embedding", "vec_id",
      nCells = 3, threshold = 0.99, iters = 3)
    val found = pairs.where(col("id_a") === 1000L && col("id_b") === 1001L)
    assert(found.count() === 1L)
    assert(found.select("cosine").head.getDouble(0) > 0.9999)
  }
}
