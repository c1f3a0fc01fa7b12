package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Round-12 machinery: Morton-key bit interleaving (operators/ZOrder,
  * gate q130) and the prefix-filter candidate generation the q129 exact
  * similarity join relies on. */
class Queries9Spec extends SparkSpec {
  import spark.implicits._

  private def morton(bits: Int, x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.mortonKey(bits, col("x"), col("y")))
      .head().getLong(0)

  test("mortonKey interleaves bits: dim 0 at even, dim 1 at odd positions") {
    // hand-computed pins: z = Σ bit_i(x)·2^(2i) + bit_i(y)·2^(2i+1)
    assert(morton(4, 0L, 0L) === 0L)
    assert(morton(4, 1L, 0L) === 1L)
    assert(morton(4, 0L, 1L) === 2L)
    assert(morton(4, 1L, 1L) === 3L)
    assert(morton(4, 2L, 0L) === 4L)
    assert(morton(4, 3L, 3L) === 15L)
    assert(morton(4, 5L, 0L) === 17L)  // 101 -> 010001
    assert(morton(4, 0L, 5L) === 34L)  // 101 -> 100010
    assert(morton(4, 7L, 7L) === 63L)
  }

  test("mortonKey rejects bits < 1 with a clear error (empty.reduce " +
      "guard)") {
    val e = intercept[IllegalArgumentException] {
      ZOrder.mortonKey(0, col("x"), col("y"))
    }
    assert(e.getMessage.contains("bits"))
  }

  test("mortonKey masks to the requested bits and stays non-negative") {
    // 4-bit key: values >= 16 alias their low 4 bits, never overflow
    assert(morton(4, 16L, 0L) === morton(4, 0L, 0L))
    assert(morton(4, 21L, 0L) === morton(4, 5L, 0L))
    // 21-bit, both dims at the mask limit: fits in 42 bits, positive
    val top = morton(21, (1L << 21) - 1, (1L << 21) - 1)
    assert(top === (1L << 42) - 1)
  }

  test("mortonKey orders a 2-D grid so box queries cluster") {
    // Within one z-quadrant every key is smaller than any key of a
    // later quadrant: the 4x4 grid's quadrant of (x<2, y<2) occupies
    // exactly z-ranks 0..3 — the clustering property file-skipping
    // relies on.
    val grid = for { x <- 0 until 4; y <- 0 until 4 } yield (x.toLong,
      y.toLong)
    val ranked = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.mortonKey(2, col("x"), col("y")).as("z"))
      .orderBy(col("z")).collect()
    val firstQuadrant = ranked.take(4).map(r => (r.getLong(0),
      r.getLong(1))).toSet
    assert(firstQuadrant === Set((0L, 0L), (1L, 0L), (0L, 1L),
      (1L, 1L)))
  }

  test("prefix filter misses no qualifying pair on an adversarial corpus") {
    // Docs engineered so high-frequency tokens dominate overlaps (the
    // case where a WRONG prefix order — common tokens first — loses
    // pairs): the guarantee must come from the df-ascending order.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta zeta"),      // J(0,1)=4/6=0.667 < 0.7
      (2L, "alpha beta gamma delta epsilon"),   // J(0,2)=1.0
      (3L, "alpha beta gamma delta epsilon eta"), // J(0,3)=5/6=0.833
      (4L, "omega psi chi phi"),
      (5L, "omega psi chi phi upsilon"),        // J(4,5)=4/5=0.8
      (6L, "alpha omega")                       // low overlap with all
    ).toDF("doc_id", "text")
    val toks = array_distinct(filter(
      split(lower(col("text")), "[^a-z]+"), x => x =!= ""))
    val d = docs.select(col("doc_id"), toks.as("tok"))
    // brute-force truth at theta = 0.7
    val a = d.select(col("doc_id").as("ia"), col("tok").as("ta"))
    val b = d.select(col("doc_id").as("ib"), col("tok").as("tb"))
    val truth = a.crossJoin(b).where(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        size(array_intersect(col("ta"), col("tb"))).cast("double")
          ./((size(col("ta")) + size(col("tb")) -
            size(array_intersect(col("ta"), col("tb")))).cast("double"))
          .as("j"))
      .where(col("j") >= 0.7)
      .select(col("ia"), col("ib")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth === Set((0L, 2L), (0L, 3L), (2L, 3L), (4L, 5L)))
    // candidate generation exactly as q129 builds it
    val tf = d.select(col("doc_id"), explode(col("tok")).as("token"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val ranked = tf.join(dfreq, "token").groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), st => st.getField("token")).as("stok"))
    val prefLen = greatest(lit(1),
      size(col("stok")) - expr("(7 * size(stok) + 9) div 10") + lit(1))
    val pref = ranked.select(col("doc_id"),
      explode(slice(col("stok"), lit(1), prefLen)).as("ptok"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cand),
      s"prefix filter lost pairs: ${truth -- cand}")
    // and it actually prunes: doc 6 shares only the two most-frequent
    // tokens, which cannot BOTH be in every prefix
    assert(cand.size < 21, s"no pruning at all: $cand")
  }

  test("prefix filter is lossless on randomized corpora (3 seeds)") {
    // deterministic pseudo-random corpora from a small vocab — the
    // high-overlap regime where a buggy prefix bound would actually
    // lose pairs; truth = brute force at theta=0.7
    val vocab = ('a' to 'z').map(c => s"w$c")
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 30L).map { id =>
        val n = 4 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
          .distinct.mkString(" "))
      }.toDF("doc_id", "text")
      val toks = array_distinct(filter(
        split(lower(col("text")), "[^a-z0-9]+"), x => x =!= ""))
      val d = docs.select(col("doc_id"), toks.as("tok"))
      val a = d.select(col("doc_id").as("ia"), col("tok").as("ta"))
      val b = d.select(col("doc_id").as("ib"), col("tok").as("tb"))
      val inter = size(array_intersect(col("ta"), col("tb")))
      val truth = a.crossJoin(b).where(col("ia") < col("ib"))
        .where(inter.cast("double") /
          (size(col("ta")) + size(col("tb")) - inter).cast("double")
          >= 0.7)
        .select(col("ia"), col("ib")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val tf = d.select(col("doc_id"), explode(col("tok")).as("token"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ranked = tf.join(dfreq, "token").groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("token"))))
          .as("ts"))
        .select(col("doc_id"),
          transform(col("ts"), st => st.getField("token")).as("stok"))
      val prefLen = greatest(lit(1),
        size(col("stok")) - expr("(7 * size(stok) + 9) div 10") +
          lit(1))
      val pref = ranked.select(col("doc_id"),
        explode(slice(col("stok"), lit(1), prefLen)).as("ptok"))
      val cand = pref.as("a").join(pref.as("b"),
          col("a.ptok") === col("b.ptok") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.subsetOf(cand),
        s"seed $seed: prefix filter lost ${truth -- cand}")
    }
  }

  test("integer prefix-length arithmetic equals true rational ceil") {
    // (7n+9) div 10 must equal ceil(7n/10) exactly for every set size —
    // the soundness bound is a rational, and the integer form carries
    // no floating-point rounding question at all (a double ceil is
    // only correct as long as 0.7*n happens to round the right way).
    for (n <- 1 to 10000) {
      val exact = if (7 * n % 10 == 0) 7 * n / 10 else 7 * n / 10 + 1
      assert((7 * n + 9) / 10 === exact, s"n=$n")
    }
  }
}
