package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Kernels
import graft.types._

/** Property tests promised in SURVEY §5: promotion lattice laws and
  * kernel invariants. Deterministic ScalaCheck generators driven from
  * a fixed seed (scalatestplus bridge is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      Seed(0xC0FFEEL + i)))

  private val scalarDtypes: Gen[Dtype] = for {
    n <- Gen.oneOf(true, false)
    d <- Gen.oneOf[Boolean => Dtype](
      TBoolean(_), TInt8(_), TInt16(_), TInt32(_), TInt64(_),
      TFloat32(_), TFloat64(_))
  } yield d(n)

  private val dtypePairs = samples(Gen.zip(scalarDtypes, scalarDtypes))
  private val dtypeTriples =
    samples(Gen.zip(scalarDtypes, scalarDtypes, scalarDtypes))

  test("promote is commutative and idempotent on the lattice") {
    dtypePairs.foreach { case (a, b) =>
      assert(Dtype.promote(a, b) === Dtype.promote(b, a), s"($a, $b)")
    }
    samples(scalarDtypes).foreach { a =>
      assert(Dtype.promote(a, a) === Some(a), a)
    }
  }

  test("promote is associative") {
    dtypeTriples.foreach { case (a, b, c) =>
      val left = Dtype.promote(a, b).flatMap(Dtype.promote(_, c))
      val right = Dtype.promote(b, c).flatMap(Dtype.promote(a, _))
      assert(left === right, s"($a, $b, $c)")
    }
  }

  test("promotion result nullability = OR of inputs") {
    dtypePairs.foreach { case (a, b) =>
      assert(Dtype.promote(a, b).exists(_.nullable ==
        (a.nullable || b.nullable)), s"($a, $b)")
    }
  }

  test("commonDtype lifts through lists") {
    dtypePairs.foreach { case (a, b) =>
      val lifted = Dtype.commonDtype(TList(a), TList(b))
      assert(lifted.map { case TList(i, _, _) => i } ===
        Dtype.promote(a, b), s"($a, $b)")
    }
  }

  test("sigrid_hash lands in [0, maxValue) for any input") {
    val gen = Gen.zip(Gen.long, Gen.long, Gen.choose(1L, 1000000L))
    samples(gen, 2000).foreach { case (v, salt, max) =>
      val h = Kernels.sigridHash(v, salt, max)
      assert(h >= 0L && h < max, s"sigridHash($v, $salt, $max) = $h")
    }
  }

  test("hamming64 is a metric on the hypercube") {
    samples(Gen.zip(Gen.long, Gen.long, Gen.long), 1000).foreach {
      case (a, b, c) =>
        assert(Kernels.hamming64(a, a) === 0)
        assert(Kernels.hamming64(a, b) === Kernels.hamming64(b, a))
        assert(Kernels.hamming64(a, c) <=
          Kernels.hamming64(a, b) + Kernels.hamming64(b, c))
    }
  }

  test("asof join matches a brute-force reference on random tables") {
    import org.apache.spark.sql.functions.col
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    // small key/ts domains force heavy key collisions and ts ties
    val row = Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 40L))
    val leftRows = samples(row, 120).zipWithIndex
      .map { case ((k, ts), i) => (k, ts, i.toLong) }
    // right side unique per (key, ts): deterministic as-of target
    val rightRows = samples(row, 80).distinct.zipWithIndex
      .map { case ((k, ts), i) => (k, ts, 1000L + i) }
    val l = leftRows.toDF("k", "ts", "lid")
    val r = rightRows.toDF("k", "ts", "rid")
    val got = graft.operators.AsOfJoin
      .asof(l, r, Seq("k"), Seq("k"), "ts", "ts")
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // brute force: for each left row, max-ts right row with ts <= lts
    leftRows.foreach { case (k, lts, lid) =>
      val expect = rightRows.filter(rr => rr._1 == k && rr._2 <= lts)
        .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
      assert(got(lid) === expect, s"left ($k, $lts, $lid)")
    }
  }

  test("bucketize is monotone in its argument") {
    val borders = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(2.0, 5.0, 10.0))
    val gen = Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(-100.0, 100.0))
    samples(gen, 1000).foreach { case (x, y) =>
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      assert(Kernels.bucketize(lo, borders) <= Kernels.bucketize(hi, borders),
        s"($lo, $hi)")
    }
  }

  test("chunk reconstructs the document for any (n, max, overlap)") {
    import org.apache.spark.sql.functions.{col, explode}
    import graft.operators.TextAnalysis
    val gen = Gen.zip(Gen.choose(1, 120), Gen.choose(2, 50))
      .flatMap { case (n, m) => Gen.choose(0, m - 1).map(o => (n, m, o)) }
    samples(gen, 60).foreach { case (n, m, o) =>
      import spark.implicits._
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val chunks = Seq(text).toDF("text")
        .select(explode(TextAnalysis.chunk(col("text"), m, o)).as("c"))
        .select("c.chunk_idx", "c.chunk_text", "c.n_tokens")
        .collect().sortBy(_.getInt(0))
      // stitching chunks minus each successor's leading overlap
      // reproduces the token stream exactly
      val stride = m - o
      val stitched = chunks.zipWithIndex.flatMap { case (r, i) =>
        val toks = r.getString(1).split(" ").toSeq
        if (i == 0) toks else toks.drop(toks.length.min(o))
      }
      assert(stitched === (1 to n).map(i => s"w$i"),
        s"n=$n max=$m overlap=$o")
      chunks.foreach(r => assert(r.getLong(2) <= m && r.getLong(2) > 0))
    }
  }

  test("packing conserves docs/tokens within budget for random inputs") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import graft.operators.Packing
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 200), Gen.choose(5, 80))
    samples(gen, 8).zipWithIndex.foreach { case ((rows, budget), i) =>
      val data = (0 until rows)
        .map(j => (j.toLong, ((j * 31 + i * 7) % 120 + 1).toLong))
      val df = data.toDF("id", "n").repartition(3)
      val packed = Packing.packGreedy(df, "id", "n", budget)
      val seqs = packed.groupBy("seq_id")
        .agg(sum("n_tokens").as("t"), count(lit(1)).as("d"))
      assert(seqs.where(col("t") > budget && col("d") > 1).count() === 0,
        s"rows=$rows budget=$budget")
      val got = packed.agg(sum("n_tokens"), count(lit(1))).head
      assert(got.getLong(0) === data.map(_._2).sum)
      assert(got.getLong(1) === rows.toLong)
    }
  }

  test("prefixSumInOrder equals the sequential prefix sum for random " +
      "sizes, weights (zeros included), duplicate order keys, and " +
      "partition counts") {
    import graft.operators.Packing
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 150), Gen.choose(1, 9),
      Gen.choose(2, 11))
    samples(gen, 8).zipWithIndex.foreach { case ((rows, kMod, parts), i) =>
      // weights include zeros; order key deliberately NON-unique so the
      // id tiebreak carries the total order
      val data = (0 until rows).map(j =>
        (j.toLong, (j * 17 + i * 5) % 7L, ((j * 13 + i) % kMod).toLong))
      val df = data.toDF("id", "w", "k").repartition(3)
      val got = Packing.prefixSumInOrder(df, "id", "w", Seq("k"), parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var off = 0L
      data.sortBy(d => (d._3, d._1)).foreach { case (id, w, _) =>
        assert(got(id) === off, s"rows=$rows kMod=$kMod parts=$parts id=$id")
        off += w
      }
      assert(off === data.map(_._2).sum)
    }
  }
}
