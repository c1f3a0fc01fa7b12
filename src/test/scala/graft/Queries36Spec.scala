package graft

import org.apache.spark.sql.functions._

/** Round-17 gate invariants beyond the DuckDB hash: the q264 block
  * layout's tiling/reassembly laws (the hash proves Spark == DuckDB;
  * these prove both equal the CONTRACT a block-packed loader relies
  * on), and q266's exact-quantile staging arithmetic against an
  * independent Scala model.
  */
class Queries36Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q264 fragments tile every block exactly — contiguous, " +
      "non-overlapping, full 128 slots except the corpus tail — and " +
      "reassemble every document bit-for-bit") {
    val rows = SparkEntry.queries("q264_block_rows")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("block_id"),
        r.getAs[Long]("frag_off"), r.getAs[Long]("frag_len"),
        r.getAs[String]("frag_text"), r.getAs[Boolean]("is_doc_start"),
        r.getAs[Boolean]("is_doc_end"), r.getAs[String]("block_mask")))
    assert(rows.nonEmpty)

    // corpus truth: every doc's tokens + <eos>
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", split(trim(col("text")), "\\s+"), lit("<eos>"))
          .as("full"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // (1) per-block tiling: fragments sorted by offset are contiguous
    // from 0 and sum to 128 on every block except the global last
    val totalTokens = docs.values.map(_.split(" ").length.toLong).sum
    val lastBlock = (totalTokens - 1) / 128
    val tailLen = totalTokens - lastBlock * 128
    rows.groupBy(_._2).foreach { case (bid, frs) =>
      val sorted = frs.sortBy(_._3)
      var expect = 0L
      sorted.foreach { f =>
        assert(f._3 === expect,
          s"block $bid: gap/overlap at offset ${f._3}, expected $expect")
        expect += f._4
      }
      val want = if (bid == lastBlock) tailLen else 128L
      assert(expect === want, s"block $bid covers $expect of $want")
      // masks of one block OR together to full coverage and never
      // overlap (sum of 1-bits == covered slots)
      val ones = sorted.map(_._8.count(_ == '1').toLong).sum
      assert(ones === expect, s"block $bid mask bits $ones != $expect")
    }

    // (2) per-doc reassembly: fragments in block order concatenate to
    // the document's exact token stream, with start/end flags on the
    // correct fragments
    rows.groupBy(_._1).foreach { case (id, frs) =>
      val sorted = frs.sortBy(f => (f._2, f._3))
      val joined = sorted.map(_._5).filter(_.nonEmpty).mkString(" ")
      assert(joined === docs(id), s"doc $id reassembly diverged")
      assert(sorted.head._6 && sorted.last._7,
        s"doc $id start/end flags misplaced")
      assert(sorted.count(_._6) === 1 && sorted.count(_._7) === 1,
        s"doc $id must have exactly one start and one end fragment")
    }
  }

  test("q266 staging equals an independent Scala model of exact " +
      "integer rank quantiles (20/60/20 split, ties on doc_id)") {
    val got = SparkEntry.queries("q266_curriculum")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rank"), r.getAs[String]("stage"))))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length.toLong
    docs.sortBy(d => (d._2, d._1)).zipWithIndex.foreach {
      case ((id, _), rk) =>
        val stage = if (rk * 5 < n) "warmup"
          else if (rk * 5 < n * 4) "main" else "anneal"
        assert(got(id) === ((rk.toLong, stage)), s"doc $id")
    }
  }
}
