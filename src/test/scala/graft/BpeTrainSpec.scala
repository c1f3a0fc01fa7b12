package graft

import graft.functions.{BpeEncoder, BpeTrain}

/** BPE training (functions/BpeTrain.scala; gate q108). Pins the
  * Sennrich Algorithm-1 merge order on a hand-computed corpus, the
  * deterministic tie-break, early stop, the GPT-2 vocabulary
  * convention, and that trained tables round-trip through BpeEncoder.
  */
class BpeTrainSpec extends SparkSpec {

  test("merge order is hand-verifiable (counts, then leftmost " +
      "non-overlapping application)") {
    // words: aaab x3, aab x2 (char level for readability)
    // pairs: (a,a) = 2*3 + 1*2 = 8, (a,b) = 3+2 = 5 -> merge (a,a)
    // then: aaab=[aa,a,b], aab=[aa,b]
    // pairs: (aa,a)=3, (a,b)=3, (aa,b)=2 -> tie, lexicographic:
    //   ("a","b") < ("aa","a") -> merge (a,b)
    // then: aaab=[aa,ab], aab=[aa,b]
    // pairs: (aa,ab)=3, (aa,b)=2 -> merge (aa,ab)
    val (ranks, _) = BpeTrain.train(
      Seq("aaab" -> 3L, "aab" -> 2L), numMerges = 3, byteLevel = false)
    assert(ranks === Map(
      ("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2))
  }

  test("training stops early when no pair reaches minPairFreq") {
    val (ranks, _) = BpeTrain.train(
      Seq("ab" -> 1L, "cd" -> 1L), numMerges = 10, byteLevel = false,
      minPairFreq = 2L)
    assert(ranks.isEmpty)
    val (ranks2, _) = BpeTrain.train(
      Seq("ab" -> 5L), numMerges = 10, byteLevel = false)
    assert(ranks2 === Map(("a", "b") -> 0)) // then "ab" has no pairs
  }

  test("byte-level vocab follows the GPT-2 convention: base bytes " +
      "0-255, merge results 256+rank") {
    val (ranks, vocab) = BpeTrain.train(
      Seq("hi" -> 4L, "hit" -> 2L), numMerges = 2)
    assert(ranks === Map(("h", "i") -> 0, ("hi", "t") -> 1))
    assert(vocab("h") === 'h'.toLong) // printable ascii maps to itself
    assert(vocab("hi") === 256L)
    assert(vocab("hit") === 257L)
    assert(vocab.size === 258)
  }

  test("char-level vocab keeps every BASE symbol even when merges " +
      "consume all its standalone occurrences") {
    // after 3 merges the in-training buffers hold [aa,ab] / [aa,b] —
    // the base alphabet {a, b} must come from the PRE-merge units, or
    // any standalone 'a' would silently map to unkId
    val (_, vocab) = BpeTrain.train(
      Seq("aaab" -> 3L, "aab" -> 2L), numMerges = 3, byteLevel = false)
    assert(vocab.contains("a") && vocab.contains("b"))
    assert(vocab("a") === 0L && vocab("b") === 1L) // sorted base first
    assert(vocab("aa") === 2L && vocab("ab") === 3L &&
      vocab("aaab") === 4L) // merges at base.length + rank
  }

  test("trained tables drive BpeEncoder end-to-end") {
    val (ranks, vocab) = BpeTrain.train(
      Seq("low" -> 5L, "lower" -> 2L, "lowest" -> 2L), numMerges = 4)
    val enc = new BpeEncoder(ranks, vocab, unkId = -1L, byteLevel = true)
    // "low" must be a single learned token after 4 merges
    assert(enc.bpe("low") === Vector("low"))
    assert(enc.encode("low").forall(_ >= 0L)) // no unknowns on corpus
    // decode fidelity: concatenating the tokens of any text restores
    // its byte-unicode image (BPE merges never drop or reorder bytes)
    val text = "low lower lowest"
    val glued = enc.tokenize(text).mkString
    val image = text.getBytes("UTF-8").map(b =>
      BpeEncoder.byteToUnicode(b & 0xff)).mkString
    assert(glued === image)
  }

  test("trainFromCorpus counts words distributed and caps the " +
      "driver-side vocabulary") {
    import spark.implicits._
    val df = Seq("aaab aab aaab", "aaab  aab").toDF("text")
    val (ranks, _) = BpeTrain.trainFromCorpus(df, "text", numMerges = 1,
      byteLevel = true)
    assert(ranks === Map(("a", "a") -> 0)) // same corpus as the pin
    val err = intercept[IllegalArgumentException] {
      BpeTrain.trainFromCorpus(df, "text", numMerges = 1, maxVocab = 1)
    }
    assert(err.getMessage.contains("distinct words"))
  }
}
