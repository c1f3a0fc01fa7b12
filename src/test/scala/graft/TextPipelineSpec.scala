package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Round-10 pipeline operators: decontamination, connected-components
  * dup-group resolution, PII scrubbing, TF-IDF. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ---- decontamination -------------------------------------------------

  private lazy val trainDocs = Seq(
    (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma"
    (2L, "zeta eta theta iota kappa"), // clean
    (3L, "one two three alpha beta gamma delta x"), // two shared grams
    (4L, "totally unrelated words here now")) // clean
    .toDF("doc_id", "text")
  private lazy val evalDocs = Seq(
    (100L, "alpha beta gamma delta qq")) // grams incl. "beta gamma delta"
    .toDF("doc_id", "text")

  test("decontaminate flags docs sharing word n-grams with the eval set") {
    val hits = Dedup.decontaminate(trainDocs, evalDocs, "text", "doc_id", 3)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits")))
    // doc 1: "alpha beta gamma", "beta gamma delta" (not "gamma delta
    // epsilon" — eval has "gamma delta qq"); doc 3: the same two
    assert(hits === Seq((1L, 2L), (3L, 2L)))
  }

  test("decontaminate returns nothing when the eval set is disjoint") {
    val ev = Seq((9L, "completely fresh benchmark text")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(trainDocs, ev, "text", "doc_id", 3).count() === 0)
  }

  // ---- connected components --------------------------------------------

  // ---- paragraph dedup (CCNet) -----------------------------------------

  test("dedupParagraphs keeps first occurrences by (id, pos) and " +
      "rebuilds docs; a fully-duplicated doc comes back empty") {
    val docs = Seq(
      (1L, Seq("aa", "bb", "aa")), // in-doc repeat: pos 2 dropped
      (2L, Seq("bb", "cc")), // bb seen in doc 1 -> only cc survives
      (3L, Seq("aa", "bb")) // everything seen earlier -> empty
    ).toDF("id", "paras")
    val got = Dedup.dedupParagraphs(docs, "id", "paras")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getInt(2), r.getInt(3))).toSeq
    assert(got === Seq(
      (1L, List("aa", "bb"), 3, 2),
      (2L, List("cc"), 2, 1),
      (3L, List(), 2, 0)))
  }

  test("dedupParagraphs preserves intra-doc paragraph order") {
    val docs = Seq(
      (10L, Seq("z", "y", "x")),
      (11L, Seq("y", "w", "z", "v"))).toDF("id", "paras")
    val got = Dedup.dedupParagraphs(docs, "id", "paras")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(got === Seq(10L -> List("z", "y", "x"), 11L -> List("w", "v")))
  }

  test("connectedComponents labels chains, cliques and isolated pairs") {
    // chain 1-2-3 (diameter 2), clique 10-11-12, pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (21L, 20L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .orderBy("id").collect().toSeq
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component")))
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents keeps self-loop-only nodes as singleton " +
      "components (a label row for EVERY id in the pair graph)") {
    // node 7's only edge is (7,7); node 2 has a self-loop AND a real
    // edge — both must appear in the output
    val pairs = Seq((7L, 7L), (2L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .orderBy("id").collect().toSeq
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component")))
    assert(got === Seq(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("connectedComponents handles a long chain within maxIter") {
    // path 0-1-2-...-9: diameter 9 needs several star rounds
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, maxIter = 20)
      .agg(count(lit(1)), countDistinct(col("component")),
        min(col("component"))).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((10L, 1L, 0L)))
  }

  test("large-star/small-star: a 10k-node path (worst diameter) " +
      "converges in O(log² n) star rounds, not O(n)") {
    val n = 10000L
    val pairs = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val (labels, rounds) = Dedup.connectedComponentsWithStats(pairs,
      maxIter = 40)
    val got = labels.agg(count(lit(1)), countDistinct(col("component")),
      min(col("component")), max(col("id"))).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((n, 1L, 0L, n - 1)))
    // min-label propagation would need ~10000 rounds here; the star
    // alternation is doubly-logarithmic-ish in practice
    assert(rounds <= 25, s"took $rounds star rounds")
    info(s"10k path converged in $rounds star rounds")
  }

  test("connectedComponents raises rather than emit partial components") {
    // 4096-node path: cannot possibly star-converge in 2 rounds
    val pairs = spark.range(4095L)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 2).collect()
    }
  }

  test("star CC agrees with brute-force labels on a random graph") {
    // 300 nodes, ~200 random edges (fixed seed): compare against a
    // driver-side union-find ground truth
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(200)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(300)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = es.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      .map(id => id -> {
        // component min = min node id sharing the root
        val r = find(id.toInt)
        es.flatMap { case (a, b) => Seq(a, b) }.distinct
          .filter(x => find(x.toInt) == r).min
      })
    val got = Dedup.connectedComponents(es.toDF("id_a", "id_b"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === want)
  }

  test("buildVocab ranks by count desc then term asc with minFreq") {
    val docs = Seq("b b b a a c", "a b d", "e e").toDF("text")
    val got = TextAnalysis.buildVocab(docs, "text", maxSize = 3,
        minFreq = 2)
      .orderBy("term_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // counts: b=4 a=3 e=2 (c,d below minFreq); top-3 in order
    assert(got === Seq(("b", 0L, 4L), ("a", 1L, 3L), ("e", 2L, 2L)))
  }

  test("resolveKeepBest keeps the highest score, ties to lowest id") {
    // two groups: {1,2,3} scores 5,9,9 -> keeper 2 (tie 2 vs 3);
    // {10,11} scores 1,4 -> keeper 11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scores = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 1.0),
      (11L, 4.0)).toDF("id", "score")
    val got = Dedup.resolveKeepBest(pairs, scores)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L),
      (10L, 10L, 11L), (11L, 10L, 11L)))
  }

  test("resolveKeepBest: unscored ids stay in the output; a fully " +
      "unscored component falls back to its min-id keeper") {
    // {1,2,3}: 3 unscored, 2 has best score -> keeper 2, 3 still listed;
    // {10,11}: nobody scored -> keeper = min id 10
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scores = Seq((1L, 5.0), (2L, 9.0)).toDF("id", "score")
    val got = Dedup.resolveKeepBest(pairs, scores)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L),
      (10L, 10L, 10L), (11L, 10L, 10L)))
  }

  // ---- PII -------------------------------------------------------------

  test("piiRedact replaces all emails, phones and IPv4s") {
    val df = Seq(
      "mail a.user+tag@sub.example.com and b@x.io now",
      "call +1-555-0142 or +1-800-9999 end",
      "host 10.0.3.77 and 192.168.255.1 up",
      "no pii at all here").toDF("t")
      .select(TextAnalysis.piiRedact(col("t")).as("r"))
    assert(col0(df) === Seq(
      "mail <EMAIL> and <EMAIL> now",
      "call <PHONE> or <PHONE> end",
      "host <IPV4> and <IPV4> up",
      "no pii at all here"))
  }

  test("piiRedact matches full 3-3-4 NANP numbers, not only the " +
      "short 3-4 shape") {
    // a standard US number previously slipped through: the 3-4 pattern
    // fails mid-match at '555-' and regex has no alternative to try
    val red = col0(Seq(
      "call +1-212-555-0123 today",
      "alt +1-800-9999 line").toDF("t")
      .select(TextAnalysis.piiRedact(col("t"))))
    assert(red === Seq("call <PHONE> today", "alt <PHONE> line"))
  }

  test("piiCounts counts per kind; email pass precedes ipv4") {
    val r = Seq("a@b.co 1.2.3.4 +1-000-1111 c@d.org")
      .toDF("t").select(TextAnalysis.piiCounts(col("t")).as("c"))
      .select("c.n_email", "c.n_phone", "c.n_ipv4").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((2, 1, 1)))
    // a dotted-quad inside an email domain must not be half-eaten by
    // the IPv4 pass (email runs first and swallows the whole address)
    val red = col0(Seq("x j.doe@10.0.0.1.example.com y").toDF("t")
      .select(TextAnalysis.piiRedact(col("t"))))
    assert(red === Seq("x <EMAIL> y"))
  }

  // ---- bigram perplexity ----------------------------------------------

  test("bigramPerplexity matches the hand-computed add-alpha model") {
    // unigrams a:3 b:2 c:1, V=3; bigrams "a b":2, "a c":1, alpha=0.5
    // P(b|a) = 2.5/4.5, P(c|a) = 1.5/4.5
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexity(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("ppl")))
    assert(got.map(x => (x._1, x._2)) === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // ppl of a single bigram = 1/P; decimal(25,12) rounding -> 1e-9 tol
    assert(math.abs(got(0)._3 - 4.5 / 2.5) < 1e-9)
    assert(math.abs(got(2)._3 - 4.5 / 1.5) < 1e-9)
  }

  test("bigramPerplexity skips sub-bigram docs") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    assert(col0(TextAnalysis.bigramPerplexity(docs, "text", "doc_id")
      .select("doc_id")) === Seq(2L))
  }

  // ---- TF-IDF ----------------------------------------------------------

  test("tfIdfTopTerms scores rare terms above common ones, ties by term") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2 rare2"),
      (3L, "common onlyhere")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, "text", "doc_id", 2)
      .orderBy("doc_id", "rk").collect().toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Int]("rk")))
    // "common" appears in all 3 docs -> idf ln(1) = 0, never top
    assert(got === Seq((1L, "rare1", 1), (1L, "common", 2),
      (2L, "rare2", 1), (2L, "common", 2),
      (3L, "onlyhere", 1), (3L, "common", 2)))
    val scores = TextAnalysis.tfIdfTopTerms(docs, "text", "doc_id", 2)
      .where(col("term") === "rare2").select("score").head().getDouble(0)
    assert(math.abs(scores - 2 * math.log(3.0)) < 1e-12)
  }

  // ---- exact-substring span dedup ---------------------------------------

  test("dedupSpans removes losing k-word spans, unions overlaps, and " +
      "passes short docs through whole") {
    val docs = Seq(
      (1L, "a b c d e f"), // owns the first "a b c d"
      (2L, "x a b c d y"), // loses its copy at pos 1 -> only x y left
      (3L, "a b c d e f"), // exact copy of doc 1 -> fully removed
      (4L, "a b c"), // shorter than k: no spans, kept whole
      (5L, "p q r s p q r s p q r s") // self-repeat: one period survives
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs, "doc_id", "text", k = 4)
      .orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got === Seq(
      (1L, "a b c d e f", 6, 0),
      (2L, "x y", 6, 4),
      (3L, "", 6, 6),
      (4L, "a b c", 3, 0),
      (5L, "p q r s", 12, 8)))
  }

  test("dedupSpans start-set expansion equals a brute-force replay of " +
      "the covered-position union") {
    // seeded random corpus over a 6-word alphabet: heavy k-gram
    // repetition, losers overlapping at many offsets, docs below k —
    // pins the round-22 rewrite (aggregate loser span STARTS, expand
    // to covered positions row-locally after the aggregate) against an
    // independent single-threaded replay of the declared policy
    val k = 4
    val rnd = new scala.util.Random(42)
    val corpus = (0L until 40L).map { id =>
      (id, Seq.fill(3 + rnd.nextInt(20))(s"w${rnd.nextInt(6)}")
        .mkString(" "))
    }
    val allGrams = corpus.flatMap { case (id, text) =>
      val w = text.split("\\s+").toSeq
      if (w.size >= k)
        (0 to w.size - k).map(p => (w.slice(p, p + k).mkString(" "), id, p))
      else Seq.empty
    }
    val winner = allGrams.groupBy(_._1)
      .map { case (g, occ) => g -> occ.map(o => (o._2, o._3)).min }
    val expected = corpus.map { case (id, text) =>
      val w = text.split("\\s+").toSeq
      val covered = scala.collection.mutable.SortedSet[Int]()
      if (w.size >= k)
        for (p <- 0 to w.size - k) {
          val g = w.slice(p, p + k).mkString(" ")
          if (winner(g) != ((id, p))) covered ++= (p until p + k)
        }
      (id, w.zipWithIndex.collect { case (x, i) if !covered(i) => x }
        .mkString(" "), w.size, covered.size)
    }
    val got = Dedup.dedupSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .orderBy("id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got === expected.sortBy(_._1))
  }

  test("dedupSpans rejects k < 2") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.dedupSpans(docs, "doc_id", "text", k = 1)
    }
  }

  // ---- C4 document filter ----------------------------------------------

  private def c4Verdict(text: String): (Boolean, String) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(TextAnalysis.c4Filter(col("text")).as("f"))
      .select("f.keep", "f.reason").head()
    (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
  }

  test("topTokenCount finds the longest run of the sorted token array") {
    val got = Seq("b a b c b", "x", "y y", "  a   b  ").toDF("text")
      .select(TextAnalysis.topTokenCount(col("text")))
    assert(col0(got) === Seq(3, 1, 2, 1))
    // NULL text stays NULL (callers decide the policy)
    assert(col0(Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.topTokenCount(col("text")))) === Seq(null))
  }

  test("c4Filter fires rules in declared order with integer thresholds") {
    val good = "the quality of these documents seems generally quite " +
      "reasonable because the writing contains longer standard words " +
      "throughout today"
    assert(c4Verdict(good) === ((true, null)))
    // 1. word count below 15
    assert(c4Verdict("the a of and too short") === ((false, "word_count")))
    // 2. mean word length below 4.2 (integer compare: 10*sumLen < 42*n)
    assert(c4Verdict("a b c d e f g h i j k l m n o p") ===
      ((false, "word_length")))
    // 3. one word above 20% of the document
    assert(c4Verdict(("the of " + "spammy " * 14).trim + " word here is " +
      "repeated far too many times to pass") === ((false, "repetition")))
    // 4. fewer than 2 distinct stopwords — 'the' twice still counts once
    assert(c4Verdict("the quick brown foxes jumped over lazy dogs " +
      "while the other animals watched quietly nearby today") ===
      ((false, "stopwords")))
    // 5. banned phrase, case-insensitive
    assert(c4Verdict(good + " Lorem IPSUM") === ((false, "banned")))
    // null text counts zero words
    assert(c4Verdict(null) === ((false, "word_count")))
  }
}
