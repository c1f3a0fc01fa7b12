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
}
