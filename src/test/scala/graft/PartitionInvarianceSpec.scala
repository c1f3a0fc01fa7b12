package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.frame.TFrame
import graft.operators.{Dedup, GroupTopK, Sampling}

/** Partition-invariance property: every operator this engine documents
  * as DETERMINISTIC must produce the IDENTICAL result whatever the
  * physical partitioning — the property that makes a local result
  * reproducible on a 1000-executor cluster. Each case runs the same
  * operator over 1, 7, and 32-partition layouts of the same rows (and
  * a shuffled row order) and asserts set-identical output.
  */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows with duplicate keys, text, and values; seed-fixed
  private lazy val base: DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until 10000).map { i =>
      (i.toLong, (rnd.nextInt(300)).toLong, s"doc ${rnd.nextInt(500)}",
        rnd.nextInt(1000).toDouble)
    }.toDF("id", "k", "text", "v")
  }

  private def layouts(df: DataFrame): Seq[DataFrame] = Seq(
    df.repartition(1),
    df.repartition(7, col("k")),
    df.repartition(32),
    df.orderBy(col("v")) // adversarial row order
  )

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def invariant(name: String)(op: DataFrame => DataFrame): Unit = {
    val results = layouts(base).map(l => asSet(op(l)))
    results.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r == results.head,
        s"$name: layout ${i + 1} diverged (" +
          s"${(r -- results.head).take(3)} vs " +
          s"${(results.head -- r).take(3)})")
    }
  }

  test("deterministic bernoulli sample is partition-invariant") {
    invariant("bernoulli") { df =>
      Sampling.bernoulli(df, col("id"), 0.3, seed = 7L)
        .select("id")
    }
  }

  test("stratified sample is partition-invariant") {
    invariant("stratified") { df =>
      Sampling.stratified(
        df.withColumn("s", concat(lit("g"), pmod(col("k"), lit(3)))),
        col("s"), col("id"),
        Map("g0" -> 0.5, "g1" -> 0.2, "g2" -> 0.9),
        default = 0.1, seed = 11L)
        .select("id")
    }
  }

  test("deterministic shuffle ORDER is partition-invariant") {
    invariant("shuffled") { df =>
      Sampling.shuffled(df, col("id"), seed = 5L)
        .withColumn("rank", monotonically_increasing_id())
        .select("id") // order captured implicitly via collect order? no —
        // compare the ordered id sequence explicitly instead
    }
    // explicit ordered-sequence comparison (collect order is plan order)
    val seqs = layouts(base).map(l =>
      Sampling.shuffled(l, col("id"), seed = 5L)
        .select("id").collect().map(_.getLong(0)).toSeq)
    seqs.tail.foreach(s => assert(s == seqs.head,
      "shuffled: ordered sequence diverged across layouts"))
  }

  test("exact-dedup keep-first is partition-invariant") {
    invariant("exactDedup") { df =>
      Dedup.exact(df, "text", "id").select("id")
    }
  }

  test("TFrame.dropDuplicates keep-first is partition-invariant") {
    invariant("dropDuplicates") { df =>
      TFrame(df).dropDuplicates(Seq("k"), Seq("id")).df.select("id", "k")
    }
  }

  test("deterministic grouped mode is partition-invariant") {
    invariant("modeDet") { df =>
      TFrame(df.withColumn("g", pmod(col("k"), lit(4))))
        .groupby("g").modeDet("text").df
    }
  }

  test("bounded per-group top-k is partition-invariant") {
    invariant("minKByKey") { df =>
      GroupTopK.minKByKey(df, Seq("k"), "id", col("v"), 3)
    }
  }

  test("grouped aggregates are partition-invariant (DECIMAL sums)") {
    invariant("decimalAgg") { df =>
      df.groupBy(col("k"))
        .agg(sum(col("v").cast("decimal(25,4)")).cast("double").as("s"),
          count(lit(1)).as("n"))
    }
  }

  test("splitmix64 split labels are partition-invariant") {
    invariant("splitLabel") { df =>
      df.select(col("id"),
        Sampling.splitLabel(col("id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
          .as("split"))
    }
  }
}
