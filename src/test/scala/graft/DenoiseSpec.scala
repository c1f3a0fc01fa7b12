package graft

import org.apache.spark.sql.functions._

import graft.functions.Kernels
import graft.operators.{Denoise, Sampling}

/** Span corruption (operators/Denoise.scala; gate q252). Pins the
  * T5 sentinel-collapse semantics on hand-built masks, the empty/null
  * edge, and agreement with a Scala-native model over the real
  * splitmix64 mask on randomized docs. */
class DenoiseSpec extends SparkSpec {
  import spark.implicits._

  /** Scala-native model of spanCorrupt for one doc. */
  private def model(id: Long, toks: Seq[String], thr: Int, seed: Long)
      : (String, String, Long, Long) = {
    val m = toks.indices.map(i =>
      Kernels.sampleBucket(id * Denoise.PosSpace + i, seed) < thr)
    val in = new StringBuilder
    val tgt = new StringBuilder
    var k = -1
    var nMask = 0L
    var nSpan = 0L
    toks.indices.foreach { i =>
      val start = m(i) && (i == 0 || !m(i - 1))
      if (start) { k += 1; nSpan += 1 }
      if (m(i)) nMask += 1
      def app(sb: StringBuilder, s: String): Unit = {
        if (sb.nonEmpty) sb.append(' '); sb.append(s)
      }
      if (!m(i)) app(in, toks(i))
      else if (start) app(in, s"<extra_id_$k>")
      if (m(i)) {
        if (start) app(tgt, s"<extra_id_$k> ${toks(i)}")
        else app(tgt, toks(i))
      }
    }
    (in.toString, tgt.toString, nMask, nSpan)
  }

  test("sentinel collapse: runs of masked tokens become one " +
      "<extra_id_k>; target lists sentinel + hidden tokens") {
    // find a (seed, doc) pair whose mask has a 2-run and a 1-run so
    // the pinned expectation exercises multi-token spans
    val toks = (0 until 10).map(i => s"t$i")
    val density = 0.35
    val thr = Sampling.threshold(density)
    val out = Denoise.spanCorrupt(
      Seq((7L, toks)).toDF("id", "toks"), "id", "toks", density, 5L)
      .head()
    val (in, tgt, nm, ns) = model(7L, toks, thr, 5L)
    assert(out.getString(1) === in)
    assert(out.getString(2) === tgt)
    assert(out.getLong(3) === nm && out.getLong(4) === ns)
    // structural invariants independent of the mask draw
    assert(out.getLong(4) <= out.getLong(3))
    val sentinels = "<extra_id_(\\d+)>".r
      .findAllMatchIn(out.getString(1)).map(_.group(1).toInt).toSeq
    assert(sentinels === (0 until out.getLong(4).toInt),
      "input sentinels are 0..n_spans-1 in order")
    assert(sentinels === "<extra_id_(\\d+)>".r
      .findAllMatchIn(out.getString(2)).map(_.group(1).toInt).toSeq,
      "target carries the same sentinels in the same order")
  }

  test("spanCorrupt equals the Scala model on randomized docs " +
      "(token conservation: input reals + target hidden = all tokens)") {
    val rnd = new scala.util.Random(0x5EED)
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(20))(s"w${rnd.nextInt(50)}"))
    }
    val density = 0.25
    val thr = Sampling.threshold(density)
    val got = Denoise.spanCorrupt(
      docs.toDF("id", "toks"), "id", "toks", density, 11L)
      .orderBy("id").collect()
    docs.foreach { case (id, toks) =>
      val r = got(id.toInt)
      val (in, tgt, nm, ns) = model(id, toks, thr, 11L)
      assert(r.getString(1) === in, s"input id=$id")
      assert(r.getString(2) === tgt, s"target id=$id")
      assert(r.getLong(3) === nm && r.getLong(4) === ns, s"counts id=$id")
      // conservation: non-sentinel input tokens + non-sentinel target
      // tokens multiset-equal the original
      val strip = (s: String) => s.split(" ").toSeq
        .filterNot(_.startsWith("<extra_id_")).filter(_.nonEmpty)
      assert((strip(in) ++ strip(tgt)).sorted === toks.sorted,
        s"conservation id=$id")
    }
  }

  test("spanCorrupt plans exactly ONE exchange (windows + rebuild " +
      "share the doc-id partitioning)") {
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    val plan = Denoise.spanCorrupt(df, "id", "toks", 0.3, 1L)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected 1 exchange, got $n:\n$plan")
  }

  test("null and empty token arrays yield empty strings, zero counts") {
    val df = Seq(
      (0L, Seq.empty[String]),
      (1L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    val out = Denoise.spanCorrupt(df, "id", "toks", 0.3, 1L)
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.getString(1) === "" && r.getString(2) === "")
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L)
    }
  }

  /** Scala-native model of mlmMask for one doc. */
  private def mlmModel(id: Long, toks: Seq[String], thrSel: Int,
      seed: Long): (String, String, Long, Long, Long, Long) = {
    val maskThr = Sampling.threshold(0.8)
    val randThr = Sampling.threshold(0.9)
    def b(i: Int, s: Long) =
      Kernels.sampleBucket(id * Denoise.PosSpace + i, s)
    val sel = toks.indices.map(i => b(i, seed) < thrSel)
    val masked = toks.indices.map { i =>
      if (!sel(i)) toks(i)
      else {
        val d = b(i, seed + 1)
        if (d < maskThr) "[MASK]"
        else if (d < randThr) toks(b(i, seed + 2) % toks.size)
        else toks(i)
      }
    }
    val labels = toks.indices.filter(sel).map(i => s"$i:${toks(i)}")
    val ds = toks.indices.filter(sel).map(i => b(i, seed + 1))
    (masked.mkString(" "), labels.mkString(" "), sel.count(identity),
      ds.count(_ < maskThr),
      ds.count(d => d >= maskThr && d < randThr),
      ds.count(_ >= randThr))
  }

  test("mlmMask equals the Scala model on randomized docs; the plan " +
      "is shuffle-free (pure row-local HOFs)") {
    val rnd = new scala.util.Random(0x317A)
    val docs = (0 until 150).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(24))(s"w${rnd.nextInt(40)}"))
    }
    val density = 0.15
    val thr = Sampling.threshold(density)
    val df = docs.toDF("id", "toks")
    val got = Denoise.mlmMask(df, "id", "toks", density, 23L)
      .orderBy("id").collect()
    docs.foreach { case (id, toks) =>
      val r = got(id.toInt)
      val (ms, ls, nSel, nMask, nRand, nKeep) =
        mlmModel(id, toks, thr, 23L)
      assert(r.getString(1) === ms, s"masked id=$id")
      assert(r.getString(2) === ls, s"labels id=$id")
      assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        === ((nSel, nMask, nRand, nKeep)), s"counts id=$id")
      assert(nSel === nMask + nRand + nKeep)
    }
    val plan = Denoise.mlmMask(df, "id", "toks", density, 23L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"MLM must be shuffle-free:\n$plan")
  }

  test("mlmMask null/empty docs yield null/empty outputs, zero counts") {
    val df = Seq(
      (0L, Seq.empty[String]),
      (1L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    val out = Denoise.mlmMask(df, "id", "toks", 0.15, 1L)
      .orderBy("id").collect()
    assert(out(0).getString(1) === "" && out(0).getString(2) === "")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    out.foreach { r =>
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L &&
        r.getLong(5) === 0L && r.getLong(6) === 0L)
    }
  }

  /** Scala-native model of spanCorruptMixture's MASK for one doc
    * (the rebuild is the already-pinned spanCorrupt model). */
  private def ul2Mask(id: Long, n: Int, seed: Long): Seq[Boolean] = {
    val cfg = Kernels.sampleBucket(id, seed + 7) % 3
    val thrR = Sampling.threshold(0.15)
    val thrX = Sampling.threshold(0.5)
    (0 until n).map { i =>
      cfg match {
        case 0 => Kernels.sampleBucket(id * Denoise.PosSpace + i, seed) < thrR
        case 2 => Kernels.sampleBucket(id * Denoise.PosSpace + i, seed) < thrX
        case _ => i >= n - (n + 3) / 4
      }
    }
  }

  test("spanCorruptMixture routes each doc to R/S/X, masks per the " +
      "config, prepends the mode token; ONE exchange") {
    val rnd = new scala.util.Random(0x012)
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(16))(s"w${rnd.nextInt(30)}"))
    }
    val df = docs.toDF("id", "toks")
    val got = Denoise.spanCorruptMixture(df, "id", "toks", 29L)
      .orderBy("id").collect()
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, toks) =>
      val r = got(id.toInt)
      val cfg = Kernels.sampleBucket(id, 36L) % 3
      val mode = Seq("[R]", "[S]", "[X]")(cfg)
      assert(r.getString(1) === mode, s"denoiser id=$id")
      seen += mode
      assert(r.getString(2).startsWith(mode), s"mode prefix id=$id")
      val m = ul2Mask(id, toks.size, 29L)
      assert(r.getLong(4) === m.count(identity).toLong, s"n_masked id=$id")
      // S-denoiser: exactly one tail span of ceil(n/4) positions
      if (cfg == 1) {
        assert(r.getLong(5) === 1L, s"S must be one span id=$id")
        assert(r.getLong(4) === ((toks.size + 3) / 4).toLong,
          s"S tail size id=$id")
        assert(r.getString(3).startsWith("<extra_id_0> "),
          s"S target id=$id")
      }
      // conservation through the shared rebuild
      val strip = (s: String) => s.split(" ").toSeq
        .filterNot(x => x.startsWith("<extra_id_") || x == "[R]" ||
          x == "[S]" || x == "[X]").filter(_.nonEmpty)
      assert((strip(r.getString(2)) ++ strip(r.getString(3))).sorted
        === toks.sorted, s"conservation id=$id")
    }
    assert(seen === Set("[R]", "[S]", "[X]"), s"all three routed: $seen")
    val plan = Denoise.spanCorruptMixture(df, "id", "toks", 29L)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected 1 exchange, got $n:\n$plan")
  }

  /** Scala-native model of fimTransform for one doc. */
  private def fimModel(id: Long, toks: Seq[String], thr: Int, seed: Long)
      : (Boolean, String, String, Long, Long, Long) = {
    val ap = Kernels.sampleBucket(id, seed) < thr
    if (!ap) (false, toks.mkString(" "), toks.mkString(" "),
      toks.size, 0L, 0L)
    else {
      val n = toks.size
      val c1 = Kernels.sampleBucket(id, seed + 1) % (n + 1)
      val c2 = Kernels.sampleBucket(id, seed + 2) % (n + 1)
      val (lo, hi) = (math.min(c1, c2), math.max(c1, c2))
      val (p, m, s) = (toks.take(lo), toks.slice(lo, hi), toks.drop(hi))
      val psm = (Seq("<fim_prefix>") ++ p ++ Seq("<fim_suffix>") ++ s ++
        Seq("<fim_middle>") ++ m).mkString(" ")
      val spm = (Seq("<fim_suffix>") ++ s ++ Seq("<fim_prefix>") ++ p ++
        Seq("<fim_middle>") ++ m).mkString(" ")
      (true, psm, spm, lo, hi - lo, n - hi)
    }
  }

  test("fimTransform equals the Scala model on randomized docs " +
      "(segment conservation; both PSM and SPM orders); shuffle-free") {
    val rnd = new scala.util.Random(0xF13)
    val docs = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(15))(s"w${rnd.nextInt(40)}"))
    }
    val rate = 0.5
    val thr = Sampling.threshold(rate)
    val df = docs.toDF("id", "toks")
    val got = Denoise.fimTransform(df, "id", "toks", rate, 31L)
      .orderBy("id").collect()
    var applied = 0
    docs.foreach { case (id, toks) =>
      val r = got(id.toInt)
      val (ap, psm, spm, np, nm, ns) = fimModel(id, toks, thr, 31L)
      assert(r.getBoolean(1) === ap, s"applied id=$id")
      assert(r.getString(2) === psm, s"psm id=$id")
      assert(r.getString(3) === spm, s"spm id=$id")
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((np, nm, ns)),
        s"counts id=$id")
      assert(np + nm + ns === toks.size, s"conservation id=$id")
      if (ap) applied += 1
      // transformed docs: stripping sentinels from PSM recovers the
      // tokens as prefix ++ suffix ++ middle
      if (ap) {
        val strip = r.getString(2).split(" ").toSeq
          .filterNot(_.startsWith("<fim_")).filter(_.nonEmpty)
        val lo = np.toInt; val hi = (np + nm).toInt
        assert(strip === toks.take(lo) ++ toks.drop(hi) ++
          toks.slice(lo, hi), s"psm layout id=$id")
      }
    }
    assert(applied > 30 && applied < 120, s"rate sanity: $applied/150")
    val plan = Denoise.fimTransform(df, "id", "toks", rate, 31L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"FIM must be shuffle-free:\n$plan")
  }

  test("fimTransform null docs pass through as null strings, zero " +
      "counts, fim_applied = false") {
    val df = Seq((0L, null.asInstanceOf[Seq[String]]),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val out = Denoise.fimTransform(df, "id", "toks", 1.0, 31L)
      .orderBy("id").collect()
    assert(!out(0).getBoolean(1) && out(0).isNullAt(2) && out(0).isNullAt(3))
    assert((out(0).getLong(4), out(0).getLong(5), out(0).getLong(6))
      === ((0L, 0L, 0L)))
    // empty doc at rate 1.0: applied, sentinels only
    assert(out(1).getBoolean(1))
    assert(out(1).getString(2) === "<fim_prefix> <fim_suffix> <fim_middle>")
  }

  /** Scala-native model of nspPairs over the whole frame. */
  private def nspModel(docs: Seq[(Long, Seq[String])], thr: Int,
      seed: Long, groups: Int)
      : Map[Long, (String, String, Boolean, Long)] = {
    def segs(toks: Seq[String]) = {
      val sp = (toks.size + 1) / 2
      (toks.take(sp), toks.drop(sp))
    }
    docs.groupBy { case (id, _) =>
      Kernels.sampleBucket(id, seed + 9) % groups
    }.values.flatMap { grp =>
      val ordered = grp.sortBy { case (id, _) =>
        (Kernels.sampleHash(id, seed), id)
      }
      ordered.zipWithIndex.map { case ((id, toks), i) =>
        val (a, b) = segs(toks)
        val sw = Kernels.sampleBucket(id, seed + 1) < thr &&
          ordered.size >= 2
        val (pid, pb) =
          if (!sw) (id, b)
          else {
            val (nid, ntoks) = ordered((i + 1) % ordered.size)
            (nid, segs(ntoks)._2)
          }
        id -> (a.mkString(" "), pb.mkString(" "), !sw, pid)
      }
    }.toMap
  }

  test("nspPairs equals the Scala model (shuffled-neighbor partner, " +
      "wrap-around, singleton-group fallback); plans ONE exchange") {
    val rnd = new scala.util.Random(0x2019)
    val docs = (0 until 140).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(10))(s"w${rnd.nextInt(30)}"))
    }
    val rate = 0.4
    val thr = Sampling.threshold(rate)
    // groups = 96 > 140 docs: plenty of singleton groups exercise the
    // no-partner fallback alongside multi-doc wrap-arounds
    val expect = nspModel(docs, thr, 41L, 96)
    val df = docs.toDF("id", "toks")
    val got = Denoise.nspPairs(df, "id", "toks", rate, 41L, 96)
      .collect()
    assert(got.length === docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (a, b, isNext, pid) = expect(id)
      assert(r.getString(1) === a, s"seg_a id=$id")
      assert(r.getString(2) === b, s"seg_b id=$id")
      assert(r.getBoolean(3) === isNext, s"is_next id=$id")
      assert(r.getLong(4) === pid, s"partner id=$id")
      if (!isNext) assert(pid !== id, "swapped pair must cite another doc")
    }
    val swapped = got.count(!_.getBoolean(3))
    assert(swapped > 10, s"swap-rate sanity: $swapped/140")
    val plan = Denoise.nspPairs(df, "id", "toks", rate, 41L, 96)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected 1 exchange, got $n:\n$plan")
  }

  test("nspPairs with groups = 1 (one global shuffle order): every " +
      "swap takes the next doc, the last wraps to the first") {
    val docs = (0 until 20).map { i =>
      (i.toLong, (0 until 4).map(j => s"d${i}t$j"))
    }
    val thr = Sampling.threshold(1.0) // swap EVERY doc
    val expect = nspModel(docs, thr, 5L, 1)
    val got = Denoise.nspPairs(docs.toDF("id", "toks"), "id", "toks",
      1.0, 5L, groups = 1).collect()
    got.foreach { r =>
      val (a, b, isNext, pid) = expect(r.getLong(0))
      assert(!r.getBoolean(3) && !isNext, "rate 1.0 swaps everything")
      assert(r.getString(1) === a && r.getString(2) === b)
      assert(r.getLong(4) === pid)
      assert(pid !== r.getLong(0))
      // partner B is verbatim the partner's own second half
      assert(r.getString(2) === docs(pid.toInt)._2.drop(2).mkString(" "))
    }
  }

  test("a doc longer than PosSpace raises instead of colliding mask " +
      "keys with the next doc") {
    val long = Seq((0L, (0 to Denoise.PosSpace).map(_.toString)))
      .toDF("id", "toks")
    val e = intercept[Exception] {
      Denoise.spanCorrupt(long, "id", "toks", 0.2, 1L).collect()
    }
    assert(e.getMessage.contains("PosSpace") ||
      e.getMessage.contains("4096"))
    val e2 = intercept[Exception] {
      Denoise.mlmMask(long, "id", "toks", 0.15, 1L).collect()
    }
    assert(e2.getMessage.contains("PosSpace") ||
      e2.getMessage.contains("4096"))
  }
  test("sftMask matches the hand model: concat + eos, prompt masked to " +
      "-100, left-truncation drops only prompt positions") {
    val df = Seq(
      (0L, Seq(10L, 11L), Seq(20L, 21L, 22L)),          // fits (6 <= 8)
      (1L, Seq(30L, 31L, 32L, 33L, 34L), Seq(40L, 41L)) // 8+eos > 8 -> trunc
    ).toDF("id", "p", "r")
    val got = Denoise.sftMask(df, "p", "r", eosId = 2L, maxLen = 8)
      .collect().map(row => row.getAs[Long]("id") -> ((
        row.getSeq[Long](row.fieldIndex("input_ids")),
        row.getSeq[Long](row.fieldIndex("labels")),
        row.getAs[Long]("n_tokens"), row.getAs[Long]("n_supervised"))))
      .toMap
    assert(got(0L) === ((Seq(10L, 11L, 20L, 21L, 22L, 2L),
      Seq(-100L, -100L, 20L, 21L, 22L, 2L), 6L, 4L)))
    // id 1: 5 prompt + 2 response + eos = 8 == maxLen -> no truncation
    assert(got(1L) === ((Seq(30L, 31L, 32L, 33L, 34L, 40L, 41L, 2L),
      Seq(-100L, -100L, -100L, -100L, -100L, 40L, 41L, 2L), 8L, 3L)))
    val tr = Denoise.sftMask(df.where(col("id") === 1L), "p", "r",
        eosId = 2L, maxLen = 6)
      .collect().head
    // maxLen 6 cuts the two OLDEST prompt tokens, never the response
    assert(tr.getSeq[Long](tr.fieldIndex("input_ids")) ===
      Seq(32L, 33L, 34L, 40L, 41L, 2L))
    assert(tr.getSeq[Long](tr.fieldIndex("labels")) ===
      Seq(-100L, -100L, -100L, 40L, 41L, 2L))
    assert(tr.getAs[Long]("n_supervised") === 3L)
  }

  test("sftMask raises on empty prompt/response, on a supervised span " +
      "exceeding maxLen, and plans zero exchanges") {
    val ok = Seq((0L, Seq(1L), Seq(2L, 3L))).toDF("id", "p", "r")
    val plan = Denoise.sftMask(ok, "p", "r", eosId = 2L, maxLen = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sftMask must be row-local:\n$plan")
    def boom(df: org.apache.spark.sql.DataFrame, msg: String): Unit = {
      val e = intercept[Exception] {
        Denoise.sftMask(df, "p", "r", eosId = 2L, maxLen = 4).collect()
      }
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    boom(Seq((0L, Seq.empty[Long], Seq(2L))).toDF("id", "p", "r"),
      "empty p")
    boom(Seq((0L, Seq(1L), Seq.empty[Long])).toDF("id", "p", "r"),
      "empty r")
    boom(Seq((0L, Seq(1L), Seq(2L, 3L, 4L, 5L))).toDF("id", "p", "r"),
      "exceeds maxLen")
    assert(intercept[IllegalArgumentException] {
      Denoise.sftMask(ok, "p", "r", eosId = 2L, maxLen = 1)
    }.getMessage.contains("maxLen=1"))
  }
}
