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

  test("bitwise ops battery (test_numerical_column.py:630-647)") {
    import spark.implicits._
    // bool forms: native logical operators carry the pinned tables
    val gh = Seq((true, false), (false, false), (true, true), (false, true))
      .toDF("g", "h")
    assert(col0(gh.select(col("g") && col("h"))) ===
      Seq(false, false, true, false))
    assert(col0(gh.select(col("g") || col("h"))) ===
      Seq(true, false, true, true))
    assert(col0(gh.select(col("g") =!= col("h"))) ===
      Seq(true, false, false, true))
    assert(col0(gh.select(!col("g"))) === Seq(false, true, false, true))
    // int forms: i=[1,2,0], j=[3,2,3]
    val ij = Seq((1L, 3L), (2L, 2L), (0L, 3L)).toDF("i", "j")
    assert(col0(ij.select(col("i").arith.bitAnd(col("j")))) ===
      Seq(1L, 2L, 0L))
    assert(col0(ij.select(col("i").arith.bitOr(col("j")))) ===
      Seq(3L, 2L, 3L))
    assert(col0(ij.select(col("i").arith.bitXor(col("j")))) ===
      Seq(2L, 0L, 3L))
    assert(col0(ij.select(org.apache.spark.sql.functions.lit(2L)
      .arith.bitAnd(col("i")))) === Seq(0L, 2L, 0L))
    assert(col0(ij.select(col("i").arith.bitNot)) ===
      Seq(-2L, -3L, -1L))
  }

  test("python % sign battery + powInt raises on negative exponent " +
      "(test_numerical_column.py:425-447)") {
    import spark.implicits._
    // e=[13,-13,13,-13], f=[3,3,-3,-3] → e % f = [1,2,-2,-1]
    val ef = Seq((13L, 3L), (-13L, 3L), (13L, -3L), (-13L, -3L))
      .toDF("e", "f")
    assert(col0(ef.select(col("e").arith.floormod(col("f")))) ===
      Seq(1L, 2L, -2L, -1L))
    // c ** d int stays int: [0,1,3] ** [5,5,6] = [0,1,729]
    val cd = Seq((0L, 5L), (1L, 5L), (3L, 6L)).toDF("c", "d")
    assert(col0(cd.select(col("c").arith.powInt(col("d")))) ===
      Seq(0L, 1L, 729L))
    val ex = intercept[Exception] {
      cd.select(col("c").arith.powInt(
        org.apache.spark.sql.functions.lit(-2L))).collect()
    }
    assert(ex.getMessage.contains(
      "Integers to negative integer powers are not allowed"))
  }

  test("numpy round battery incl. negative decimals " +
      "(test_numerical_column.py:586-603)") {
    import spark.implicits._
    val vals = Seq(1.1, 1.5, 1.8, 2.5, -1.1, -1.5, -1.8, -2.5,
      1.12, 1.15, 1.25, 11.1, 11.5, 11.9)
    val df = vals.toDF("x")
    def got(d: Int): Seq[Double] =
      col0(df.select(col("x").arith.round(d))).map(_.asInstanceOf[Double])
    // np.round: half-even on the scaled double
    assert(got(0) === Seq(1.0, 2.0, 2.0, 2.0, -1.0, -2.0, -2.0, -2.0,
      1.0, 1.0, 1.0, 11.0, 12.0, 12.0))
    val r1 = got(1)
    val exp1 = Seq(1.1, 1.5, 1.8, 2.5, -1.1, -1.5, -1.8, -2.5,
      1.1, 1.2, 1.2, 11.1, 11.5, 11.9) // 1.15→1.2 (numpy, not python)
    r1.zip(exp1).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"round(1): $a vs $b") }
    val rm1 = got(-1)
    val expm1 = Seq(0.0, 0.0, 0.0, 0.0, -0.0, -0.0, -0.0, -0.0,
      0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    rm1.zip(expm1).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"round(-1): $a vs $b") }
  }

  test("functional slice/array_intersect/width_bucket " +
      "(transformation/test_functional.py:58-97)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{slice => fslice,
      array_intersect, width_bucket, lit, array, typedLit}
    val lists = Seq(Seq(11L, 12L, 13L), Seq(21L, 22L, 23L, 24L, 25L, 26L),
      Seq(31L, 32L)).toDF("l")
    assert(col0(lists.select(fslice(col("l"), 2, 3))) ===
      Seq(Seq(12L, 13L), Seq(22L, 23L, 24L), Seq(31L, 32L).drop(1)))
    assert(col0(lists.select(
      array_intersect(col("l"), typedLit(Seq(12L, 22L, 23L, 32L))))) ===
      Seq(Seq(12L), Seq(22L, 23L), Seq(32L)))
    val wb = Seq((3.14, 0.0, 4.0, 3L), (2.0, 0.0, 4.0, 3L),
      (-1.0, 0.0, 3.2, 4L)).toDF("x", "b1", "b2", "n")
    assert(col0(wb.select(width_bucket(col("x"), col("b1"), col("b2"),
      col("n")))) === Seq(3L, 2L, 0L))
  }

  test("fill_null per-dtype battery: one scalar fills int32/int64/" +
      "float32/float64 columns alike " +
      "(transformation/test_data_clean_ops.py:39-56)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("int32", IntegerType, nullable = true),
      StructField("int64", LongType, nullable = true),
      StructField("float32", FloatType, nullable = true),
      StructField("float64", DoubleType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(null, 1L, 1.0f, 1.0),
      Row(2, null, 2.0f, 2.0),
      Row(3, 3L, null, 3.0),
      Row(4, 4L, 4.0f, null))
    val f = TFrame(spark.createDataFrame(rows, schema)).fillNull(42L)
    val got = f.df.collect().map(_.toSeq)
    assert(got.map(_(0)).toSeq === Seq(42, 2, 3, 4))
    assert(got.map(_(1)).toSeq === Seq(1L, 42L, 3L, 4L))
    assert(got.map(_(2)).toSeq === Seq(1.0f, 2.0f, 42.0f, 4.0f))
    assert(got.map(_(3)).toSeq === Seq(1.0, 2.0, 3.0, 42.0))
  }

  test("str concat + three-valued comparison battery: null propagates " +
      "through +, ==, < (test_string_column.py:183-224)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val s1 = Seq[Any]("abc", "de", "", "f", null)
    val s2 = Seq[Any]("12", "567", "77", null, "55")
    val df = TFrame(spark, Seq("a" -> s1, "b" -> s2,
      "i" -> s1.indices.map(_.toLong))).df.orderBy("i")
    // c1 + c2: null if either side is null
    assert(col0(df.select(concat(col("a"), col("b")))) ===
      Seq("abc12", "de567", "77", null, null))
    // c1 + "_suffix" / "prefix_" + c1
    assert(col0(df.select(concat(col("a"), lit("_suffix")))) ===
      Seq("abc_suffix", "de_suffix", "_suffix", "f_suffix", null))
    assert(col0(df.select(concat(lit("prefix_"), col("a")))) ===
      Seq("prefix_abc", "prefix_de", "prefix_", "prefix_f", null))
    // comparisons are three-valued: null operand -> null result
    val d = Seq[Any]("abc", "77", "", null, "55")
    val cmp = TFrame(spark, Seq("c" -> s1, "d" -> d,
      "i" -> s1.indices.map(_.toLong))).df.orderBy("i")
    assert(col0(cmp.select(col("c") === col("d"))) ===
      Seq(true, false, true, null, null))
    assert(col0(cmp.select(col("c") < col("d"))) ===
      Seq(false, false, false, null, null))
    assert(col0(cmp.select(col("c") === lit("de"))) ===
      Seq(false, true, false, false, null))
  }

  test("str pattern-matching battery: startswith/endswith/find over " +
      "empty and too-short strings (test_string_column.py:251-275)") {
    import org.apache.spark.sql.functions.col
    val s = Seq("hello.this", "is.interesting.", "this.is_24",
      "paradise", "h", "")
    val df = TFrame(spark,
      Seq("s" -> s, "i" -> s.indices.map(_.toLong))).df.orderBy("i")
    val c = col("s")
    assert(col0(df.select(c.str.startswith("h"))) ===
      Seq(true, false, false, false, true, false))
    assert(col0(df.select(c.str.endswith("this"))) ===
      Seq(true, false, false, false, false, false))
    // CPython str.find: -1 when absent, including needle longer than
    // the string and the empty string
    assert(col0(df.select(c.str.find("this"))) ===
      Seq(6, -1, 0, -1, -1, -1))
    assert(col0(df.select(c.str.replace("this", "that"))) ===
      s.map(_.replace("this", "that")))
  }

  test("list.slice over null elements, Python start:end semantics " +
      "(transformation/test_list.py:45-59)") {
    import org.apache.spark.sql.functions.col
    val df = TFrame(spark, Seq("a" -> Seq(
      Seq[Any](1L, 2L, null, 3L),
      Seq[Any](4L, null, 5L),
      Seq[Any](1L, 2L, 3L, 4L, 5L)))).df
    val a = col("a")
    assert(col0(df.select(a.list.slice(1, 3))) ===
      Seq(Seq(2L, null), Seq(null, 5L), Seq(2L, 3L)))
    // stop past the end truncates like Python, never errors
    assert(col0(df.select(a.list.slice(2, 4))) ===
      Seq(Seq(null, 3L), Seq(5L), Seq(3L, 4L)))
    assert(col0(df.select(a.list.slice(0, 2))) ===
      Seq(Seq(1L, 2L), Seq(4L, null), Seq(1L, 2L)))
  }

  test("maps keys/values/get battery over a null map row " +
      "(test_map_column.py:61-66)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.lit
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(0, Map("abc" -> 123L)),
      Row(1, Map("de" -> 45L, "fg" -> 67L)),
      Row(2, null))
    val df = spark.createDataFrame(rows, schema).orderBy("i")
    val m = df("m")
    assert(col0(df.select(m.maps.keys)) ===
      Seq(Seq("abc"), Seq("de", "fg"), null))
    assert(col0(df.select(m.maps.values)) ===
      Seq(Seq(123L), Seq(45L, 67L), null))
    // fill applies to a MISSING KEY; the null map row stays null
    assert(col0(df.select(m.maps.get(lit("de"), lit(0L)))) ===
      Seq(0L, 45L, null))
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

  test("log battery: log(1)=0, log(0)=-inf, log(4)=ln4, null->null, " +
      "per dtype (test_numeric_ops.py:53-79)") {
    import spark.implicits._
    // the reference runs the same values through int32/int64/float32/
    // float64 columns; our lattice computes in double for all four
    for (f <- Seq(
        TFrame(Seq[java.lang.Integer](1, 0, 4, null).toDF("x")),
        TFrame(Seq[java.lang.Long](1L, 0L, 4L, null).toDF("x")),
        TFrame(Seq[java.lang.Float](1.0f, 0.0f, 4.0f, null).toDF("x")),
        TFrame(Seq[java.lang.Double](1.0, 0.0, 4.0, null).toDF("x")))) {
      val got = f.df.select(f("x").arith.logNat).collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
      assert(got(0) === 0.0)
      assert(got(1) === Double.NegativeInfinity,
        "log(0) must be -inf (C semantics), not Spark's NULL")
      assert(math.abs(got(2).asInstanceOf[Double] - math.log(4)) < 1e-12)
      assert(got(3) === null)
    }
    // std::log of a negative is NaN, never NULL
    val neg = TFrame(Seq(-1.0).toDF("x"))
    val r = neg.df.select(neg("x").arith.logNat).head()
    assert(r.getDouble(0).isNaN)
  }
}
