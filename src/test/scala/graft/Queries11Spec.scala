package graft

import org.apache.spark.sql.functions._

import graft.functions.Functional

/** Round-12 machinery past q150: the FastSS edit-distance-1 deletion
  * neighborhood (kernel pins + completeness property, gate q152) and
  * date-battery / histogram edge semantics.
  */
class Queries11Spec extends SparkSpec {
  import spark.implicits._

  private def neigh(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(Functional.editNeighborhood1(col("t")))
      .head().getSeq[String](0)

  test("editNeighborhood1 emits the string plus every deletion") {
    assert(neigh("abc") === Seq("abc", "bc", "ac", "ab"))
    assert(neigh("a") === Seq("a", ""))
    assert(neigh("") === Seq(""))
  }

  test("editNeighborhood1 deletes whole codepoints, not UTF-16 units") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16; deleting
    // it must remove the whole codepoint, never half of it
    val clef = new String(Character.toChars(0x1D11E))
    assert(neigh(s"a${clef}b") ===
      Seq(s"a${clef}b", s"${clef}b", "ab", s"a$clef"))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("neighborhood join is complete for ed<=1 (randomized property)") {
    // every pair within distance 1 MUST share a key; pairs sharing a
    // key but beyond distance 1 are allowed (the verify step prunes)
    val rnd = new scala.util.Random(7)
    val strs = (0 until 60).map { _ =>
      (0 until 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    }.distinct
    val nb = strs.map(s => s -> neigh(s).toSet).toMap
    for (a <- strs; b <- strs if a < b && lev(a, b) <= 1) {
      assert(nb(a).intersect(nb(b)).nonEmpty,
        s"ed(${a}, ${b}) = ${lev(a, b)} but neighborhoods are disjoint")
    }
  }

  test("q153 weekday()+1 is ISO day-of-week (Monday=1)") {
    val out = Seq("2026-08-10", "2026-08-14", "2026-08-16")
      .toDF("d")
      .select((weekday(col("d").cast("date")) + 1).as("isodow"))
      .collect().map(_.getInt(0)).toSeq
    assert(out === Seq(1, 5, 7)) // Mon, Fri, Sun
  }

  test("q157 histogram bucket arithmetic handles a constant column") {
    // mx - mn + 1 = 1: every value lands in bucket 0, no div-by-zero
    val df = Seq(5L, 5L, 5L).toDF("v")
    val m = df.agg(min(col("v")), max(col("v"))).head()
    val (mn, mx) = (m.getLong(0), m.getLong(1))
    val width = mx - mn + 1
    val buckets = df
      .groupBy(expr(s"((v - $mn) * 8) div $width").as("bucket"))
      .count().collect()
    assert(buckets.length === 1 && buckets(0).getLong(0) === 0L &&
      buckets(0).getLong(1) === 3L)
  }
}
