package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.{Functional, Kernels}

/** Pinned-contract tests for the domain kernels, with expected values
  * lifted from the reference test suite (cited per test). */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  test("sigrid_hash pinned values (test_sigrid_hash.py:48-56)") {
    val got = spark.range(16)
      .select(Functional.sigridHash(col("id"), 0L, 100L))
    assert(col0(got) === Seq(6L, 60L, 54L, 54L, 9L, 4L, 91L, 11L, 67L, 79L,
      2L, 25L, 92L, 98L, 83L, 66L))
  }

  test("sigrid_hash list form (test_sigrid_hash.py:58-66)") {
    val df = Seq(Seq(0L, 1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L))
      .toDF("a")
    val got = df.select(Functional.sigridHashList(col("a"), 0L, 100L))
    assert(col0(got).map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(6L, 60L, 54L, 54L), Seq(9L, 4L, 91L), Seq(11L, 67L, 79L)))
  }

  test("sigrid_hash maxValue=1 returns 0") {
    assert(Kernels.sigridHash(42L, 0L, 1L) === 0L)
  }

  test("bucketize pinned values (test_bucketize.py:71-110)") {
    val df = Seq(1.0, 2.0, 3.0, 5.0, 8.0, 10.0, 11.0).toDF("a")
    val got = df.select(Functional.bucketize(col("a"), Seq(2.0, 5.0, 10.0)))
    assert(col0(got) === Seq(0, 0, 1, 1, 2, 2, 3))
  }

  test("bucketize list form (test_bucketize.py:113-123)") {
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("a")
    val got = df.select(Functional.bucketizeList(col("a"), Seq(2.0)))
    assert(col0(got).map(_.asInstanceOf[Seq[Int]]) === Seq(Seq(0, 0, 1)))
  }

  // compute_score fixture (test_compute_score.py:18-45)
  private lazy val scoreDf = Seq(
    (Seq(1L, 2L, 3L), Seq(1.0f, 2.0f, 3.0f), Seq(1L, 2L, 3L),
      Seq(1.0f, 2.0f, 3.0f)),
    (Seq(4L, 5L, 6L), Seq(4.0f, 5.0f, 6.0f), Seq(0L, 10L),
      Seq(0.0f, 10.0f)),
    (Seq(7L, 8L, 9L), Seq(7.0f, 8.0f, 9.0f), Seq(7L, 10L, 10L),
      Seq(7.0f, 10.0f, 10.0f)),
    (Seq(10L, 10L, 11L, 12L), Seq(10.0f, 10.0f, 11.0f, 12.0f),
      Seq(10L, 10L, 11L, 13L), Seq(10.0f, 10.0f, 11.0f, 13.0f)))
    .toDF("input_ids", "input_id_scores", "matching_ids",
      "matching_id_scores")

  private def floats(df: org.apache.spark.sql.DataFrame): Seq[Float] =
    col0(df).map(_.asInstanceOf[Float])

  private def approx(got: Seq[Float], want: Seq[Double]): Unit = {
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"$g vs $w")
    }
  }

  test("has_id_overlap (test_compute_score.py:60-66)") {
    approx(floats(scoreDf.select(Functional.hasIdOverlap(
      col("input_ids"), col("matching_ids")))), Seq(1.0, 0.0, 1.0, 1.0))
  }

  test("id_overlap_count — multiset (test_compute_score.py:68-74)") {
    approx(floats(scoreDf.select(Functional.idOverlapCount(
      col("input_ids"), col("matching_ids")))), Seq(3.0, 0.0, 1.0, 3.0))
  }

  test("get_max_count (test_compute_score.py:76-82)") {
    approx(floats(scoreDf.select(Functional.getMaxCount(
      col("input_ids"), col("matching_ids")))), Seq(3.0, 0.0, 1.0, 3.0))
  }

  test("get_jaccard_similarity (test_compute_score.py:84-93)") {
    approx(floats(scoreDf.select(Functional.getJaccardSimilarity(
      col("input_ids"), col("matching_ids")))),
      Seq(1.0, 0.0, 1.0 / 5.0, 3.0 / 5.0))
  }

  test("get_cosine_similarity (test_compute_score.py:94-119)") {
    approx(floats(scoreDf.select(Functional.getCosineSimilarity(
      col("input_ids"), col("input_id_scores"), col("matching_ids"),
      col("matching_id_scores")))),
      Seq(
        14.0 / math.sqrt(14.0) / math.sqrt(14.0),
        0.0,
        49.0 / math.sqrt(49.0 + 64.0 + 81.0) / math.sqrt(49.0 + 400.0),
        (400.0 + 121.0) / math.sqrt(400.0 + 121.0 + 144.0) /
          math.sqrt(400.0 + 121.0 + 169.0)))
  }

  test("get_score_sum/min/max (test_compute_score.py:121-158)") {
    approx(floats(scoreDf.select(Functional.getScoreSum(
      col("input_ids"), col("input_id_scores"), col("matching_ids"),
      col("matching_id_scores")))), Seq(6.0, 0.0, 7.0, 31.0))
    approx(floats(scoreDf.select(Functional.getScoreMin(
      col("input_ids"), col("matching_ids"), col("matching_id_scores")))),
      Seq(1.0, 0.0, 7.0, 10.0))
    approx(floats(scoreDf.select(Functional.getScoreMax(
      col("input_ids"), col("matching_ids"), col("matching_id_scores")))),
      Seq(3.0, 0.0, 7.0, 11.0))
  }

  test("python string predicates (test_functional_cpu.py:24-36)") {
    val df = Seq(Some(""), Some("abc"), Some("XYZ"), Some("123"),
      Some("xyz123"), None).toDF("s")
    assert(col0(df.select(Functional.isalpha(col("s")))) ===
      Seq(false, true, true, false, false, null))
    assert(col0(df.select(upper(col("s")))) ===
      Seq("", "ABC", "XYZ", "123", "XYZ123", null))
    assert(col0(df.select(Functional.isalnum(col("s")))) ===
      Seq(false, true, true, true, true, null))
    assert(col0(df.select(Functional.isdigit(col("s")))) ===
      Seq(false, false, false, true, false, null))
    assert(col0(df.select(Functional.islower(col("s")))) ===
      Seq(false, true, false, false, true, null))
    assert(col0(df.select(Functional.isupper(col("s")))) ===
      Seq(false, false, true, false, false, null))
  }

  test("python istitle/isspace/isdecimal semantics") {
    // expectations = CPython str.is* results
    val df = Seq("Hello World", "Hello world", "  ", "½", "7").toDF("s")
    assert(col0(df.select(Functional.istitle(col("s")))) ===
      Seq(true, false, false, false, false))
    assert(col0(df.select(Functional.isspace(col("s")))) ===
      Seq(false, false, true, false, false))
    assert(col0(df.select(Functional.isdecimal(col("s")))) ===
      Seq(false, false, false, false, true))
    assert(col0(df.select(Functional.isnumeric(col("s")))) ===
      Seq(false, false, false, true, true))
  }

  test("digit predicates use the reference's Unicode categories") {
    // string_functions.h:28-41: isdecimal=Nd, isdigit=Nd|No,
    // isnumeric=Nd|Nl|No. Pins: "7"=Nd, "²"(superscript)=No,
    // "½"(fraction)=No, "Ⅴ"(Roman numeral)=Nl
    val df = Seq("7", "²", "½", "Ⅴ", "7a").toDF("s")
    assert(col0(df.select(Functional.isdecimal(col("s")))) ===
      Seq(true, false, false, false, false))
    assert(col0(df.select(Functional.isdigit(col("s")))) ===
      Seq(true, true, true, false, false))
    assert(col0(df.select(Functional.isnumeric(col("s")))) ===
      Seq(true, true, true, true, false))
    // isalnum admits every Number category (letter or Nd|Nl|No)
    assert(col0(df.select(Functional.isalnum(col("s")))) ===
      Seq(true, true, true, true, true))
  }

  test("firstx / clamp_list / add_tokens compose correctly") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(5L, 8L), Seq(13L)).toDF("a")
    assert(col0(df.select(Functional.firstx(col("a"), 3)))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(1L, 2L, 3L), Seq(5L, 8L), Seq(13L)))
    assert(col0(df.select(Functional.clampList(col("a"), lit(2L), lit(8L))))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(2L, 2L, 3L), Seq(5L, 8L), Seq(8L)))
    assert(col0(df.select(Functional.addTokens(col("a"), Seq(0L), begin = true)))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(0L, 1L, 2L, 3L), Seq(0L, 5L, 8L), Seq(0L, 13L)))
  }

  test("lookup_indices with default index") {
    val df = Seq(Seq("hello", "world", "unk")).toDF("t")
    val got = df.select(Functional.lookupIndices(
      Map("hello" -> 1L, "world" -> 2L), 0L)(col("t")))
    assert(col0(got).map(_.asInstanceOf[Seq[Long]]) === Seq(Seq(1L, 2L, 0L)))
  }

  test("simhash/hamming/minhash determinism and identity") {
    assert(Kernels.hamming64(0L, -1L) === 64)
    val df = Seq(Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y"))
      .toDF("t")
    val hs = col0(df.select(Functional.simhash64(col("t"))))
      .map(_.asInstanceOf[Long])
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
  }

  test("kernels are SQL-callable after registerAll") {
    Functional.registerAll(spark)
    val got = spark.sql(
      """SELECT sigrid_hash(id, 0, 100) AS h,
        |bucketize(CAST(id AS DOUBLE), array(2.0D, 5.0D, 10.0D)) AS b,
        |isalpha('abc') AS a,
        |fingerprint64('x') = fingerprint64('x') AS f
        |FROM range(3)""".stripMargin).collect().toSeq
    assert(got.map(_.getLong(0)) === Seq(6L, 60L, 54L))
    assert(got.map(_.getInt(1)) === Seq(0, 0, 0))
    assert(got.forall(_.getBoolean(2)))
    assert(got.forall(_.getBoolean(3)))
    val jac = spark.sql(
      "SELECT get_jaccard_similarity(array(1L,2L,3L), array(1L)) AS j")
      .head().getFloat(0)
    assert(math.abs(jac - 1.0f / 3.0f) < 1e-6)
  }

  // ---- winnowing fingerprints (Schleimer et al., SIGMOD'03 §4-5) ------

  private def winnowSet(s: String, k: Int, w: Int): Seq[Long] = {
    val a = Kernels.winnow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  test("winnow: shared run of w+k-1 bytes => shared fingerprint") {
    val k = 8; val w = 16
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      def junk(n: Int) = (0 until n)
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val shared = (0 until (w + k - 1))
        .map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val a = junk(40) + shared + junk(40)
      val b = junk(40) + shared + junk(40)
      assert(winnowSet(a, k, w).intersect(winnowSet(b, k, w)).nonEmpty,
        s"seed $seed: no shared fingerprint for a planted ${w + k - 1}-byte run")
    }
  }

  test("winnow: disjoint alphabets share nothing; identical docs everything") {
    val a = (0 until 50).map(i => s"tok${i}x").mkString(" ")
    val b = (0 until 50).map(i => s"QQ${i}!").mkString("_")
    assert(winnowSet(a, 8, 16).intersect(winnowSet(b, 8, 16)).isEmpty)
    assert(winnowSet(a, 8, 16) === winnowSet(a, 8, 16))
  }

  test("winnow: output is sorted distinct; density within [ceil(W/w), m]") {
    val k = 8; val w = 16
    val rnd = new scala.util.Random(7)
    val doc = (0 until 500).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val fp = winnowSet(doc, k, w)
    assert(fp === fp.distinct.sorted)
    val m = doc.length - k + 1 // k-gram count
    val windows = m - w + 1
    // one selection serves at most w windows => >= ceil(windows/w) picks
    assert(fp.size >= (windows + w - 1) / w && fp.size <= m,
      s"density ${fp.size} outside [${(windows + w - 1) / w}, $m]")
  }

  test("winnow: edge lengths") {
    assert(winnowSet("abc", 8, 16).isEmpty) // shorter than one k-gram
    assert(winnowSet("abcdefgh", 8, 16).size === 1) // exactly one k-gram
    // fewer k-grams than a window: min over all of them, one fingerprint
    assert(winnowSet("abcdefghij", 8, 16).size === 1)
  }

  test("winnowSelCount: >= distinct-value count, obeys the coverage " +
      "bounds, and zeroes on sub-k-gram text (the q292 companion)") {
    val k = 8; val w = 16
    def cnt(s: String) = Kernels.winnowSelCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    assert(cnt("abc") === 0L)
    assert(cnt("abcdefgh") === 1L)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 6) {
      val doc = (0 until 300 + rnd.nextInt(300))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val n = cnt(doc)
      val m = doc.length - k + 1
      val win = math.min(w, m)
      val nw = m - win + 1
      assert(n * win >= nw && n <= nw,
        s"position count $n outside the coverage bounds for m=$m")
      assert(n >= winnowSet(doc, k, w).size.toLong,
        "positions selected can never be fewer than distinct values")
    }
  }

  /** Naive winnowing reference: from-scratch k-gram hashes (no rolling
    * update) + a plain scan for the RIGHTMOST unsigned window minimum
    * + record-on-position-change + sorted distinct — the documented
    * kernel semantics, re-derived without the incremental machinery.
    * Pins the rolling-hash subtract-oldest update and the monotonic
    * deque against brute force on randomized inputs. */
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    val m = b.length - k + 1
    if (m <= 0) return Seq.empty
    val B = 0x100000001b3L
    val grams = (0 until m).map { i =>
      var h = 0L
      for (j <- i until i + k) h = h * B + (b(j) & 0xffL)
      Kernels.twangMix64(h)
    }
    val win = math.min(w, m)
    var lastPick = -1
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- (win - 1) until m) {
      var best = i - win + 1
      for (j <- (i - win + 1) to i) { // rightmost min: >= moves it right
        if (java.lang.Long.compareUnsigned(grams(j), grams(best)) <= 0)
          best = j
      }
      if (best != lastPick) { lastPick = best; sel += grams(best) }
    }
    sel.distinct.sorted.toSeq
  }

  test("winnow: property — kernel equals the naive reference on " +
      "300 randomized (text, k, w) cases") {
    val rnd = new scala.util.Random(0x5EED15L)
    for (case_ <- 0 until 300) {
      val n = rnd.nextInt(120)
      // small alphabet forces k-gram hash ties inside windows — the
      // rightmost-min tie-break is exactly what naive must replicate
      val text = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(10)
      assert(winnowSet(text, k, w) === naiveWinnow(text, k, w),
        s"case $case_: k=$k w=$w n=$n text=$text")
    }
  }

  test("winnow is SQL-callable after registerAll") {
    Functional.registerAll(spark)
    val got = spark.sql(
      "SELECT size(winnow('the quick brown fox jumps over it', 4, 4)) AS n")
      .head().getInt(0)
    assert(got >= 1)
  }

  test("cosine kernel") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val got = df.select(Functional.cosineSim(col("a"), col("b")),
      Functional.cosineSim(col("a"), col("c")))
    val r = got.head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("roundRef: reference rint semantics, not Spark round") {
    // torcharrow_round = rint on the scaled double: ties go to even
    // (2.5→2, 3.5→4); 2.675*100 is EXACTLY 267.5 in IEEE → even → 2.68;
    // 1250/100 = 12.5 → even → 12 → 1200
    assert(Kernels.roundRef(2.5, 0) === 2.0)
    assert(Kernels.roundRef(3.5, 0) === 4.0)
    assert(Kernels.roundRef(-2.5, 0) === -2.0)
    assert(Kernels.roundRef(2.675, 2) === 2.68)
    assert(Kernels.roundRef(1250.0, -2) === 1200.0)
    assert(Kernels.roundRef(Double.NaN, 2).isNaN)
    assert(Kernels.roundRef(Double.PositiveInfinity, 2)
      === Double.PositiveInfinity)
    // column path + SQL registration + divergence from Spark's half-up
    Functional.registerAll(spark)
    val r = spark.sql(
      "SELECT round_ref(CAST(2.5 AS DOUBLE), 0) AS a, " +
        "round(CAST(2.5 AS DOUBLE), 0) AS b").head()
    assert(r.getDouble(0) === 2.0 && r.getDouble(1) === 3.0)
    import graft.frame.namespaces._
    val viaNs = Seq(2.5, 3.5).toDF("x")
      .select(col("x").arith.round(0)).collect().map(_.getDouble(0)).toSeq
    assert(viaNs === Seq(2.0, 4.0))
  }
}
