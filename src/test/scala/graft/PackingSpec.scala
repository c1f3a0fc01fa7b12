package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence packing (operators/Packing.scala; gate q97_packing). Pins
  * the exact greedy assignment on a hand-built partition, the oversize
  * singleton rule, and conservation on a multi-partition frame. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy packing pins the exact (seq, pos) assignment") {
    // one partition, budget 10: [4,5] | [7,2] | [6] | [12] | [3]
    val df = Seq((0L, 4L), (1L, 5L), (2L, 7L), (3L, 2L), (4L, 6L),
      (5L, 12L), (6L, 3L)).toDF("id", "n").coalesce(1)
    val got = Packing.packGreedy(df, "id", "n", 10)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq(
      (0L, 0L, 0), (1L, 0L, 1),
      (2L, 1L, 0), (3L, 1L, 1),
      (4L, 2L, 0),
      (5L, 3L, 0), // oversize doc: singleton sequence
      (6L, 4L, 0)))
  }

  test("null id or token count fails fast with a clear contract error") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((0L, 4L), (1L, null))
      .toDF("id", "n")
    val e = intercept[Exception] {
      Packing.packGreedy(df, "id", "n", 10).collect()
    }
    assert(e.getMessage.contains("packGreedy: null n"))
  }

  test("conservation and budget hold across partitions") {
    val df = (0L until 1000L).map(i => (i, (i % 37) + 1)).toDF("id", "n")
      .repartition(7)
    val packed = Packing.packGreedy(df, "id", "n", 64)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("d"))
    assert(seqs.where(col("t") > 64 && col("d") > 1).count() === 0)
    val Seq(pt, pd) = packed.agg(sum("n_tokens"), count_distinct(col("id")))
      .head.toSeq.map(_.asInstanceOf[Long]).toSeq
    assert(pt === (0L until 1000L).map(i => (i % 37) + 1).sum)
    assert(pd === 1000L)
  }

  test("assignment is deterministic for a fixed order and partitioning") {
    val df = (0L until 500L).map(i => (i, (i * 7 % 23) + 1)).toDF("id", "n")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    val a = Packing.packGreedy(df, "id", "n", 50).orderBy("id").collect()
    val b = Packing.packGreedy(df, "id", "n", 50).orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
