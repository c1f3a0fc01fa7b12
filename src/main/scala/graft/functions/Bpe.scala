package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Vocabulary with default index — behavioral port of the reference's
  * Vocab (csrc/velox/text/vocab.{h,cpp}; bindings lib.cpp:969-1022):
  * ordered token→id, `insertToken` at a position, `appendToken`, and a
  * default index returned for unknown tokens once set.
  */
final class Vocab private (
    private var tokens: Vector[String],
    private var default: Option[Long]) extends Serializable {

  private var index: Map[String, Long] =
    tokens.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap

  def length: Int = tokens.length
  def getItos: Seq[String] = tokens
  def setDefaultIndex(i: Long): Unit = default = Some(i)
  def getDefaultIndex: Option[Long] = default

  def appendToken(token: String): Unit = {
    require(!index.contains(token), s"token $token already present")
    tokens = tokens :+ token
    index += token -> (tokens.length - 1).toLong
  }

  def insertToken(token: String, pos: Int): Unit = {
    require(!index.contains(token), s"token $token already present")
    require(pos >= 0 && pos <= tokens.length, s"bad position $pos")
    tokens = (tokens.take(pos) :+ token) ++ tokens.drop(pos)
    index = tokens.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
  }

  /** token → id; default index for unknowns (throws when unset, like
    * the reference). */
  def lookup(token: String): Long =
    index.getOrElse(token, default.getOrElse(
      throw new NoSuchElementException(
        s"token $token not found and default index not set")))

  def contains(token: String): Boolean = index.contains(token)
}

object Vocab {
  def apply(tokens: Seq[String], defaultIndex: Option[Long] = None): Vocab =
    new Vocab(tokens.toVector, defaultIndex)
}

/** Byte-pair encoder — behavioral port of the reference's GPT-2 BPE
  * (csrc/velox/text/gpt2_bpe_tokenizer.{h,cpp}, bpe_tokenize.h):
  * regex pre-tokenization, byte→unicode mapping, then greedy
  * lowest-rank adjacent-pair merges. Merge table and vocab are
  * user-supplied (the reference loads them from the public GPT-2
  * encoder files); the algorithm itself is fully implemented.
  *
  * Serializable so Spark broadcasts one copy per executor.
  */
final class BpeEncoder(
    mergeRanks: Map[(String, String), Int],
    vocab: Map[String, Long],
    unkId: Long = -1L,
    byteLevel: Boolean = true) extends Serializable {

  /** GPT-2 pre-tokenizer pattern (public). */
  @transient private lazy val pretoken =
    ("'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?=\\s)|\\s+").r

  /** The public GPT-2 byte→unicode printable mapping: printable ASCII /
    * latin-1 map to themselves, the rest shift into 256+n. */
  @transient private lazy val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      out(b) = if (printable) b.toChar else { val c = (256 + n).toChar; n += 1; c }
    }
    out
  }

  private def toUnits(piece: String): Vector[String] =
    if (byteLevel)
      piece.getBytes("UTF-8").toVector.map(b =>
        byteToUnicode(b & 0xff).toString)
    else piece.map(_.toString).toVector

  /** Greedy BPE: repeatedly merge the adjacent pair with the lowest
    * merge rank until no adjacent pair is in the merge table. */
  def bpe(piece: String): Vector[String] = {
    var parts = toUnits(piece)
    if (parts.length < 2) return parts
    var done = false
    while (!done && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        mergeRanks.get((parts(i), parts(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else parts = (parts.take(bestIdx) :+
        (parts(bestIdx) + parts(bestIdx + 1))) ++ parts.drop(bestIdx + 2)
    }
    parts
  }

  def tokenize(text: String): Seq[String] =
    pretoken.findAllIn(text).toSeq.flatMap(bpe)

  def encode(text: String): Seq[Long] =
    tokenize(text).map(t => vocab.getOrElse(t, unkId))
}

object Bpe {
  /** Column function: text → array<bigint> of BPE token ids. The encoder
    * is closed over once and shipped with the task closure (one
    * deserialized copy per executor — the broadcast pattern for model
    * assets). */
  def bpeTokenize(encoder: BpeEncoder)(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null else encoder.encode(s).toArray)
    f(text)
  }

  /** lookup_indices over a Vocab (functions.h:269-273). */
  def lookupIndices(vocab: Vocab)(tokens: Column): Column = {
    val f = udf((ts: Seq[String]) =>
      if (ts == null) null else ts.map(vocab.lookup).toArray)
    f(tokens)
  }
}
