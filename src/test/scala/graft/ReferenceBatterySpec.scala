package graft

import org.apache.spark.sql.functions.col

import graft.frame.TFrame
import graft.frame.namespaces._

/** Direct ports of the reference's own test VALUE batteries — the
  * exact fixtures and expected results from
  * test/test_numerical_column.py and test/test_string_column.py, so a
  * reference user's assertions hold verbatim against this engine.
  */
class ReferenceBatterySpec extends SparkSpec {

  // test_numerical_column.py:504-548 (base_test_agg_handling):
  // c = [1, 4, 2, 7, 9, 1]; C = c + [None]
  private val c = Seq(1L, 4L, 2L, 7L, 9L, 1L)
  private lazy val C = TFrame(spark,
    Seq("c" -> (c :+ (null: Any))))

  private def scalar(f: TFrame): Any = {
    val r = f.df.head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("agg battery: min/max/sum/mode over nullable column " +
      "(test_numerical_column.py:504-517)") {
    assert(scalar(C.min) === 1L)
    assert(scalar(C.max) === 9L)
    assert(scalar(C.sum) === 24L)
    assert(scalar(C.modeAgg) === 1L)
  }

  test("agg battery: std/mean/median match statistics.* " +
      "(test_numerical_column.py:519-525)") {
    // statistics.stdev([1,4,2,7,9,1]) — sample std
    val stdev = {
      val m = c.map(_.toDouble).sum / c.length
      math.sqrt(c.map(x => math.pow(x - m, 2)).sum / (c.length - 1))
    }
    assert(math.abs(scalar(C.std).asInstanceOf[Double] - stdev) < 1e-12)
    assert(scalar(C.mean) === 4.0)
    assert(scalar(C.median) === 3.0) // statistics.median: (2+4)/2
  }

  test("agg battery: cumulatives carry the trailing null " +
      "(test_numerical_column.py:527-539)") {
    val ordered = TFrame(spark, Seq(
      "i" -> (0L until 7L), "c" -> (c :+ (null: Any))))
    def cums(op: String): Seq[Any] = {
      val out = op match {
        case "cumsum" => ordered.cumsum(Seq("c"), Seq("i"))
        case "cummin" => ordered.cummin(Seq("c"), Seq("i"))
        case "cummax" => ordered.cummax(Seq("c"), Seq("i"))
        case "cumprod" => ordered.cumprod(Seq("c"), Seq("i"))
      }
      col0(out.df.orderBy("i").select(col(s"`c.$op`")))
    }
    assert(cums("cumsum") === Seq(1L, 5L, 7L, 14L, 23L, 24L, null))
    assert(cums("cummin") === Seq(1L, 1L, 1L, 1L, 1L, 1L, null))
    assert(cums("cummax") === Seq(1L, 4L, 4L, 7L, 9L, 9L, null))
    assert(cums("cumprod") === Seq(1L, 4L, 8L, 56L, 504L, 504L, null))
  }

  test("agg battery: quantile/percentile match numpy linear " +
      "(test_numerical_column.py:541-548)") {
    // np.quantile([1,4,2,7,9,1], q): sorted [1,1,2,4,7,9]
    val ref = TFrame(spark, Seq("c" -> c))
    assert(ref.quantile("c", 0.5) === 3.0)
    assert(ref.quantile("c", 0.1) === 1.0)
    assert(ref.quantile("c", 0.2) === 1.0)
    assert(ref.quantile("c", 0.9) === 8.0)
    assert(ref.quantile("c", 0.25) === 1.25) // percentile(25)
    assert(math.abs(ref.quantile("c", 0.111) - 1.0) < 1e-9)
    assert(math.abs(ref.quantile("c", 0.222) -
      (1.0 + (0.222 * 5 - 1.0))) < 1e-9) // pos=1.11 → 1 + .11·(2−1)
  }

  test("string comparison null propagation " +
      "(test_string_column.py:197-222)") {
    // c = ["abc","de","","f",None]; d = ["abc","77","",None,"55"]
    val df = TFrame(spark, Seq(
      "c" -> Seq[Any]("abc", "de", "", "f", null),
      "d" -> Seq[Any]("abc", "77", "", null, "55"),
      "i" -> (0L until 5L)))
    def battery(expr: org.apache.spark.sql.Column): Seq[Any] =
      col0(df.df.orderBy("i").select(expr))
    assert(battery(df("c") === df("d")) ===
      Seq(true, false, true, null, null))
    assert(battery(df("c") =!= df("d")) ===
      Seq(false, true, false, null, null))
    assert(battery(df("c") === "de") ===
      Seq(false, true, false, false, null))
    assert(battery(df("c") < df("d")) ===
      Seq(false, false, false, null, null))
    assert(battery(df("c") <= "de") ===
      Seq(true, true, true, false, null))
    assert(battery(df("c") > "de") ===
      Seq(false, false, false, true, null))
  }

  test("str.split maxsplit forms (test_string_column.py:92-102)") {
    import spark.implicits._
    val s = Seq("a b c", "1,2,3", "d e f g h",
      "hello.this.is.very.very.very.very.long")
    val df = s.toDF("s")
    def got(pat: String, n: Int): Seq[Seq[String]] =
      col0(df.select(col("s").str.split(pat, n)))
        .map(_.asInstanceOf[Seq[String]])
    // pat is LITERAL (not regex); n <= 0 → unlimited (the reference's
    // velox forward, test_string_column.py:99-100)
    assert(got(".", -1) === s.map(_.split("\\.", -1).toSeq))
    assert(got(".", 0) === s.map(_.split("\\.", -1).toSeq))
    assert(got(",", -1) === s.map(_.split(",", -1).toSeq))
    // maxsplit=2 → at most 3 fields (Python semantics)
    assert(got(".", 2).last ===
      Seq("hello", "this", "is.very.very.very.very.long"))
    assert(got(".", 10).last === s.last.split("\\.", -1).toSeq)
  }

  test("list get/join/slice (test_list_column.py:111-125)") {
    import spark.implicits._
    val words = Seq(Seq("The", "fox"), Seq("jumps"),
      Seq("over", "the", "river")).toDF("l")
    assert(col0(words.select(col("l").list.get(0))) ===
      Seq("The", "jumps", "over"))
    assert(col0(words.select(col("l").list.join(" "))) ===
      Seq("The fox", "jumps", "over the river"))
    val nums = Seq((0L until 5L), (5L until 10L), (0L until 3L))
      .map(_.toSeq).toDF("l")
    assert(col0(nums.select(col("l").list.slice(0, 4))) ===
      Seq(Seq(0L, 1L, 2L, 3L), Seq(5L, 6L, 7L, 8L), Seq(0L, 1L, 2L)))
  }

  test("na handling: fill_null / drop_null / drop_duplicates " +
      "(test_numerical_column.py:485-493)") {
    val cc = TFrame(spark, Seq(
      "x" -> Seq[Any](null, 2.0, 17.0), "i" -> (0L until 3L)))
    assert(col0(cc.fillNull(99.0).df.orderBy("i").select("x")) ===
      Seq(99.0, 2.0, 17.0))
    assert(col0(cc.dropNull().df.orderBy("i").select("x")) ===
      Seq(2.0, 17.0))
    val dd = TFrame(spark, Seq(
      "x" -> Seq[Any](null, 2.0, 17.0, 2.0), "i" -> (0L until 4L)))
    assert(col0(dd.dropDuplicates(Seq("x"), Seq("i")).df
      .select("x")).toSet === Set[Any](null, 2.0, 17.0))
  }
}
