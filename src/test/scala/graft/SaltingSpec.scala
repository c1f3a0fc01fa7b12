package graft

import org.apache.spark.sql.functions._

import graft.operators.{Salting, TextAnalysis}

/** Salted skew join (operators/Salting.scala; gate q99) and document
  * chunking (TextAnalysis.chunk; gate q98). */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join exactly") {
    val big = (0L until 3000L)
      .map(i => (i, if (i % 3 == 0) 7L else i % 50, i * 2))
      .toDF("row_id", "k", "v")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Salting.saltedJoin(big, small, "k", col("row_id"), 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("the hot key scatters over all salts, deterministically") {
    val big = (0L until 4000L).map(i => (i, 7L)).toDF("row_id", "k")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
    assert(salts.select("__salt").distinct().count() === 8)
    val a = salts.collect().map(_.toSeq).toSeq
    val b = big.repartition(5).withColumn("__salt",
        pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .collect().map(_.toSeq).toSeq
    assert(a.toSet === b.toSet)
  }

  test("saltedJoin rejects inputs already carrying __salt") {
    val big = Seq((1L, 2L)).toDF("k", "__salt")
    val small = Seq((1L, "d")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Salting.saltedJoin(big, small, "k", col("k"), 4)
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("chunk covers every token with the declared stride and overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val chunks = Seq(text).toDF("text")
      .select(explode(TextAnalysis.chunk(col("text"), 40, 8)).as("c"))
      .select("c.chunk_idx", "c.chunk_text", "c.n_tokens")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // 100 tokens, stride 32: ceil((100-8)/32) = 3 chunks
    assert(chunks.map(_._1).toSeq === Seq(0, 1, 2))
    assert(chunks(0)._2.startsWith("t1 ") && chunks(0)._3 === 40L)
    assert(chunks(1)._2.startsWith("t33 ") && chunks(1)._3 === 40L)
    // last chunk: starts at 64, runs to 100 -> 36 tokens
    assert(chunks(2)._2.startsWith("t65 ") && chunks(2)._3 === 36L)
    // consecutive chunks overlap by 8 tokens
    val c0 = chunks(0)._2.split(" ")
    val c1 = chunks(1)._2.split(" ")
    assert(c0.takeRight(8).toSeq === c1.take(8).toSeq)
  }

  test("short and empty docs yield exactly one chunk") {
    val rows = Seq("a b c", "").toDF("text")
      .select(explode(TextAnalysis.chunk(col("text"), 40, 8)).as("c"))
      .select("c.chunk_idx", "c.chunk_text").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 0))
    assert(rows.head.getString(1) === "a b c")
  }
}
