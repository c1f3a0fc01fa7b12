package graft

import org.apache.spark.sql.functions._

import graft.functions.Functional
import graft.operators.TextAnalysis

/** Gopher repetition signals (Rae et al. 2021, Table A1 family):
  * hand-computed pinned values per signal family plus range and
  * whitespace-normalization invariants. Slot layout per
  * Kernels.repetitionSignals: 0 dup_line_frac, 1 dup_line_char_frac,
  * 2 dup_para_frac, 3 dup_para_char_frac, 4-6 top 2/3/4-gram char
  * frac, 7-12 dup 5..10-gram char frac.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String): Seq[Double] =
    Seq(text).toDF("t")
      .select(Functional.repetitionSignals(col("t")))
      .collect()(0).getSeq[Double](0)

  private def approx(got: Seq[Double], want: Seq[Double]): Unit = {
    assert(got.length === 13)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-12, s"slot $i: got $g want $w")
    }
  }

  test("duplicated lines: frac and char frac") {
    // lines "x y","x y","z w": 1/3 repeat, 3/9 bytes; single paragraph
    approx(signals("x y\nx y\nz w"),
      Seq(1.0 / 3, 1.0 / 3, 0, 0, 4.0 / 6, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("duplicated paragraphs split on blank lines") {
    approx(signals("p q\n\np q\n\nr s"),
      Seq(1.0 / 3, 1.0 / 3, 1.0 / 3, 1.0 / 3, 4.0 / 6,
        0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("repeated 5-gram coverage and its 2/3/4-gram shadows") {
    // 11 unit words, "a b c d e" at 0 and 5: dup5 covers 10/11 bytes
    approx(signals("a b c d e a b c d e f"),
      Seq(0, 0, 0, 0, 4.0 / 11, 6.0 / 11, 8.0 / 11, 10.0 / 11,
        0, 0, 0, 0, 0))
  }

  test("empty and whitespace-only docs are all-zero") {
    approx(signals(""), Seq.fill(13)(0.0))
    approx(signals("  \n\n \t "), Seq.fill(13)(0.0))
  }

  test("singleton n-grams are not repetition") {
    // all words distinct -> every n-gram unique -> all word slots 0
    val s = signals("one two three four five six seven eight nine ten")
    assert(s.drop(4).forall(_ === 0.0))
  }

  test("word signals ignore the whitespace flavor between words") {
    val a = signals("a b c d e a b c d e f")
    val b = signals("a  b\tc d e   a b \t c d e f")
    // slots 4..12 are word-based; line/para slots legitimately differ
    assert(a.drop(4) === b.drop(4))
  }

  test("all slots stay in [0, 1] on messy input") {
    val messy = Seq("a", "a a", "a a a a a a a a a a a a",
      "x\n\n\n\nx\n\nx", "๛ ๛ ๛ mixed ünïcode ö ö ö\n๛ ๛ ๛",
      "\n\nlead\n\n", "word").map(signals)
    messy.foreach(s => s.foreach(v => assert(v >= 0.0 && v <= 1.0)))
  }

  test("pure repetition trips the Gopher filter; varied prose passes") {
    val spam = Array.fill(30)("buy cheap now").mkString(" ")
    val prose = "The quick brown fox jumps over the lazy dog while " +
      "seventeen distinct ideas wander through nine unrelated clauses."
    val df = Seq(("spam", spam), ("prose", prose)).toDF("id", "t")
      .select(col("id"), TextAnalysis.gopherRepetitionOk(col("t")).as("ok"))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("spam") === false)
    assert(got("prose") === true)
  }

  /** Slot-for-slot naive reference implementation of the documented
    * kernel semantics (string maps and position scans instead of
    * fused hashing) — the property check below pins ALL 13 slots on
    * randomized texts, where the hand-derived fixtures above pin only
    * the families they were built for. ASCII inputs only (the naive
    * byte math assumes 1 byte/char). */
  private def naive(text: String): Seq[Double] = {
    def segStats(segs0: Seq[String]): (Double, Double) = {
      val segs = segs0.filter(_.nonEmpty)
      if (segs.isEmpty) (0.0, 0.0)
      else {
        val seen = scala.collection.mutable.Map.empty[String, Int]
        var dup = 0L; var dupB = 0L; var tot = 0L
        segs.foreach { g =>
          val c = seen.getOrElse(g, 0) + 1; seen(g) = c
          tot += g.length
          if (c > 1) { dup += 1; dupB += g.length }
        }
        (dup.toDouble / segs.length, dupB.toDouble / tot)
      }
    }
    val (dl, dlb) = segStats(text.split("\n", -1).toSeq)
    val (dp, dpb) = segStats(text.split("\n{2,}", -1).toSeq)
    val words = text.split("[ \t\n\r\f]+", -1).filter(_.nonEmpty)
    val totalB = words.map(_.length.toLong).sum
    val grams: Seq[Double] =
      if (totalB == 0) Seq.fill(9)(0.0)
      else {
        val top = (2 to 4).map { g =>
          val m = words.length - g + 1
          if (m < 2) 0.0
          else {
            val cnt = scala.collection.mutable.Map.empty[Seq[String], Int]
            val tuples = (0 until m).map(w => words.slice(w, w + g).toSeq)
            tuples.foreach(t => cnt(t) = cnt.getOrElse(t, 0) + 1)
            val best = tuples.map(t =>
              if (cnt(t) >= 2) cnt(t).toLong * t.map(_.length).sum else 0L)
              .max
            // count*bytes overcounts on overlapping occurrences; the
            // kernel saturates the fraction at 1 (documented choice)
            math.min(1.0, best.toDouble / totalB)
          }
        }
        val dup = (5 to 10).map { g =>
          val m = words.length - g + 1
          if (m < 2) 0.0
          else {
            val cnt = scala.collection.mutable.Map.empty[Seq[String], Int]
            val tuples = (0 until m).map(w => words.slice(w, w + g).toSeq)
            tuples.foreach(t => cnt(t) = cnt.getOrElse(t, 0) + 1)
            val covered = Array.fill(words.length)(false)
            (0 until m).foreach { w =>
              if (cnt(tuples(w)) >= 2)
                (w until w + g).foreach(covered(_) = true)
            }
            words.indices.map(i =>
              if (covered(i)) words(i).length.toLong else 0L)
              .sum.toDouble / totalB
          }
        }
        top ++ dup
      }
    Seq(dl, dlb, dp, dpb) ++ grams
  }

  test("property: all 13 slots equal the naive reference on " +
      "400 randomized texts") {
    val rnd = new scala.util.Random(20260814L)
    // small alphabet with UNEQUAL byte lengths (exercises the
    // byte-weighting) + separators that create lines and paragraphs
    val alphabet = Vector("aa", "b", "ccc", "dd", "e")
    val seps = Vector(" ", " ", " ", "\n", "\n\n", "  ", "\t")
    val texts = (0 until 400).map { _ =>
      val n = rnd.nextInt(28)
      val sb = new StringBuilder
      (0 until n).foreach { i =>
        if (i > 0) sb.append(seps(rnd.nextInt(seps.length)))
        sb.append(alphabet(rnd.nextInt(alphabet.length)))
      }
      sb.toString
    }
    val got = texts.toDF("t")
      .select(Functional.repetitionSignals(col("t")))
      .collect().map(_.getSeq[Double](0))
    texts.zip(got).foreach { case (text, g) =>
      val want = naive(text)
      g.zip(want).zipWithIndex.foreach { case ((gv, wv), slot) =>
        assert(math.abs(gv - wv) < 1e-12,
          s"slot $slot: got $gv want $wv on ${text.replace("\n", "\\n")}")
      }
    }
  }

  test("struct view exposes named slots matching the raw array") {
    val row = Seq("x y\nx y\nz w").toDF("t")
      .select(TextAnalysis.repetitionSignals(col("t")).as("r"))
      .select(col("r.dup_line_frac"), col("r.top_2gram_char_frac"))
      .collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0 / 3) < 1e-12)
    assert(math.abs(row.getDouble(1) - 4.0 / 6) < 1e-12)
  }
}
