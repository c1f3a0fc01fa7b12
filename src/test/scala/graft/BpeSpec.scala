package graft

import org.apache.spark.sql.functions._

import graft.frame.TFrame
import graft.functions.{Bpe, BpeEncoder, Vocab}

/** BPE encoder, Vocab, and TFrame.join behavior. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("vocab insert/append/default semantics (lib.cpp:969-1022)") {
    val v = Vocab(Seq("<unk>", "hello", "world"))
    assert(v.lookup("hello") === 1L)
    v.appendToken("spark")
    assert(v.lookup("spark") === 3L)
    v.insertToken("first", 0)
    assert(v.lookup("first") === 0L)
    assert(v.lookup("hello") === 2L) // shifted
    intercept[NoSuchElementException] { v.lookup("missing") }
    v.setDefaultIndex(0L)
    assert(v.lookup("missing") === 0L)
  }

  test("bpe merges lowest-rank pairs first") {
    // toy character-level merge table: "ab" then "abc"
    val enc = new BpeEncoder(
      mergeRanks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("d", "e") -> 2),
      vocab = Map("abc" -> 10L, "ab" -> 11L, "de" -> 12L, "f" -> 13L),
      byteLevel = false)
    assert(enc.bpe("abc") === Vector("abc"))
    assert(enc.bpe("abdef") === Vector("ab", "de", "f"))
    assert(enc.encode("abc") === Seq(10L))
  }

  test("gpt2 pre-tokenizer splits words, numbers, punctuation") {
    // ('s) stays one pre-token: with the ('，s) merge present it fuses,
    // while the identical chars in "sit" (different pre-token) cannot
    // merge with the apostrophe
    val enc = new BpeEncoder(Map(("'", "s") -> 0), Map.empty,
      byteLevel = false)
    assert(enc.tokenize("it's 42 ok!").mkString("|") ===
      "i|t|'s| |4|2| |o|k|!")
  }

  test("byte-level mapping round-trips ascii printables") {
    val enc = new BpeEncoder(Map.empty, Map.empty, byteLevel = true)
    // 'a' printable → maps to itself, so single-char pieces survive
    assert(enc.bpe("a") === Vector("a"))
    // space (0x20) is non-printable → shifted into the 256+ range
    assert(enc.bpe(" ").head.head.toInt >= 256)
  }

  test("bpe_tokenize as a Column function on a DataFrame") {
    val enc = new BpeEncoder(
      mergeRanks = Map(("h", "i") -> 0),
      vocab = Map("hi" -> 7L), unkId = -1L, byteLevel = false)
    val df = Seq("hi hi", null.asInstanceOf[String]).toDF("s")
    val got = col0(df.select(Bpe.bpeTokenize(enc)(col("s"))))
    assert(got(0).asInstanceOf[Seq[Long]] === Seq(7L, -1L, 7L))
    assert(got(1) === null)
  }

  test("lookup_indices over Vocab column function") {
    val v = Vocab(Seq("<unk>", "a", "b"))
    v.setDefaultIndex(0L)
    val df = Seq(Seq("a", "x", "b")).toDF("t")
    assert(col0(df.select(Bpe.lookupIndices(v)(col("t"))))
      .head.asInstanceOf[Seq[Long]] === Seq(1L, 0L, 2L))
  }

  test("TFrame.join with suffixes (dataframe_cpu.py:2459-2469 sketch)") {
    val l = TFrame(spark, Seq("k" -> Seq(1L, 2L), "v" -> Seq(10L, 20L)))
    val r = TFrame(spark, Seq("k" -> Seq(2L, 3L), "v" -> Seq(200L, 300L)))
    val j = l.join(r, Seq("k"), "inner", lsuffix = "_l", rsuffix = "_r")
    assert(j.columns.toSet === Set("k", "v_l", "v_r"))
    val row = j.df.head()
    assert(row.getAs[Long]("k") === 2L)
    assert(row.getAs[Long]("v_l") === 20L)
    assert(row.getAs[Long]("v_r") === 200L)
    // left join keeps unmatched
    assert(l.join(r, Seq("k"), "left", "_l", "_r").length === 2L)
    intercept[IllegalArgumentException] { l.join(r, Seq("k")) }
  }
}
