package graft

import org.apache.spark.sql.types._

import graft.frame.TFrame

/** Frame-level broadcast arithmetic (frame/TFrameArith.scala) — port of
  * the reference operator battery test/test_dataframe.py:452-723 over
  * velox_rt/dataframe_cpu.py:624-1490. Values AND result dtypes are
  * pinned: the column-scalar promotion keeps the column's int width,
  * int/int truediv is float32, int//0 and int%0 raise. */
class TFrameArithSpec extends SparkSpec {
  import spark.implicits._

  private def c: TFrame = TFrame(Seq(0L, 1L, 3L).toDF("a"))
  private def d: TFrame = TFrame(Seq(5L, 5L, 6L).toDF("a"))
  private def e: TFrame = TFrame(Seq(1.0, 1.0, 7.0).toDF("a"))

  private def longs(f: TFrame): Seq[Long] =
    f.df.orderBy().collect().map(_.getLong(0)).toSeq
  private def doubles(f: TFrame): Seq[Double] =
    f.df.collect().map(_.getDouble(0)).toSeq
  private def floats(f: TFrame): Seq[Float] =
    f.df.collect().map(_.getFloat(0)).toSeq
  private def bools(f: TFrame): Seq[Boolean] =
    f.df.collect().map(_.getBoolean(0)).toSeq

  test("scalar +,-,* with reverse forms (test_dataframe.py:506-530)") {
    assert(longs(c + 1L) === Seq(1L, 2L, 4L))
    assert(longs(c.radd(1L)) === Seq(1L, 2L, 4L))
    assert(longs(c - 1L) === Seq(-1L, 0L, 2L))
    assert(longs(c.rsub(1L)) === Seq(1L, 0L, -2L))
    assert(longs(c * 2L) === Seq(0L, 2L, 6L))
    assert(longs(c.rmul(2L)) === Seq(0L, 2L, 6L))
    assert(longs(-c) === Seq(0L, -1L, -3L))
  }

  test("frame-frame +,-,* are positional (test_dataframe.py:512-529)") {
    assert(longs(c + d) === Seq(5L, 6L, 9L))
    assert(longs(d - c) === Seq(5L, 4L, 3L))
    assert(longs(c * d) === Seq(0L, 5L, 18L))
  }

  test("truediv: always float, int/int -> float32 " +
      "(numerical_column_cpu.py:394-399)") {
    // c / 2 = [0.0, 0.5, 1.5]; c / d = [0.0, 0.2f, 0.5]
    assert(floats(c / 2L) === Seq(0.0f, 0.5f, 1.5f))
    val cd = c / d
    assert(cd.df.schema.head.dataType === FloatType)
    assert(floats(cd) === Seq(0.0f, 0.2f, 0.5f))
    // the float32 artifact the reference battery pins:
    assert(floats(cd)(1).toDouble === 0.20000000298023224)
    // float frame / int frame stays float64
    assert(doubles(e / d) === Seq(0.2, 0.2, 7.0 / 6.0))
  }

  test("floordiv: int form stays int, float form floors to float " +
      "(test_dataframe.py:536-540)") {
    assert(longs(d.floordiv(2L)) === Seq(2L, 2L, 3L))
    assert(longs(d.rfloordiv(2L)) === Seq(0L, 0L, 0L))
    assert(longs(c.floordiv(d)) === Seq(0L, 0L, 0L))
    val ed = e.floordiv(d)
    assert(ed.df.schema.head.dataType === DoubleType)
    assert(doubles(ed) === Seq(0.0, 0.0, 1.0))
  }

  test("pow: int**int stays int (test_dataframe.py:542-544)") {
    assert(longs(c.pow(2L)) === Seq(0L, 1L, 9L))
    assert(longs(c.rpow(2L)) === Seq(1L, 2L, 8L))
    assert(longs(c.pow(d)) === Seq(0L, 1L, 729L))
  }

  test("mod battery: negative dividends/divisors, reverse forms, " +
      "null propagation (lib_test/test_column.py:97-195)") {
    // col1 = [1, -2, None, 3, -4, None] — the reference's exact matrix
    val col1 = TFrame(Seq[java.lang.Long](1L, -2L, null, 3L, -4L, null)
      .toDF("a"))
    def got(f: TFrame): Seq[Any] = f.df.collect().map(r =>
      if (r.isNullAt(0)) null else r.get(0)).toSeq
    // Python floored mod: -2 % 3 = 1, -4 % 3 = 2
    assert(got(col1.mod(3L)) === Seq(1L, 1L, null, 0L, 2L, null))
    // negative float divisor: result takes the divisor's sign
    assert(got(col1.mod(-3.0)) ===
      Seq(-2.0, -2.0, null, 0.0, -1.0, null))
    // reverse forms: 3 % col1 and -3.0 % col1
    assert(got(col1.rmod(3L)) === Seq(0L, -1L, null, 0L, -1L, null))
    assert(got(col1.rmod(-3.0)) ===
      Seq(0.0, -1.0, null, 0.0, -3.0, null))
    // frame-frame mod over [None,1,2,3,4,5]
    val col2 = TFrame(Seq[java.lang.Long](null, 1L, 2L, 3L, 4L, 5L)
      .toDF("a"))
    assert(got(col1.mod(col2)) === Seq(null, 0L, null, 0L, 0L, null))
    // neg/abs preserve int64 and nulls (test_column.py:76-95)
    assert(got(-col1) === Seq(-1L, 2L, null, -3L, 4L, null))
  }

  test("mod takes divisor sign; int % 0 raises") {
    assert(longs((c + 1L).mod(2L)) === Seq(1L, 0L, 0L))
    val err = intercept[Exception] { longs(c.mod(0L)) }
    assert(err.getMessage.contains("ZeroDivisionError"))
  }

  test("column-scalar promotion keeps the column int width " +
      "(column.h:132-216)") {
    val small = TFrame(Seq(0, 1, 3).toDF("a")) // int32 column
    val out = small + 1L // int64 scalar
    assert(out.df.schema.head.dataType === IntegerType)
    assert(out.df.collect().map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    // frame-frame uses the plain lattice: int32 + int64 -> int64
    val wide = small + c
    assert(wide.df.schema.head.dataType === LongType)
  }

  test("null propagation (test_dataframe.py:546-556)") {
    val n = TFrame(Seq[java.lang.Long](0L, 1L, 3L, null).toDF("a"))
    val got = (n + 1L).df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 4L, null))
  }

  test("comparisons lift over scalars and frames " +
      "(test_dataframe.py:472-500)") {
    assert(bools(c.eqv(1L)) === Seq(false, true, false))
    assert(bools(c.le(2L)) === Seq(true, true, false))
    assert(bools(c.gt(2L)) === Seq(false, false, true))
    assert(bools(c.eqv(c)) === Seq(true, true, true))
    assert(bools(c.eqv(d)) === Seq(false, false, false))
    assert(bools(c.lt(d)) === Seq(true, true, true))
    assert(bools(c.ge(d)) === Seq(false, false, false))
    assert(bools(c.neq(d)) === Seq(true, true, true))
  }

  test("multi-column frames lift per column; strings are an error") {
    val m = TFrame(Seq((1L, 2.0), (2L, 4.0)).toDF("i", "f"))
    val out = (m * 2L).df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((2L, 4.0), (4L, 8.0)))
    val s = TFrame(Seq((1L, "x")).toDF("i", "s"))
    val err = intercept[IllegalArgumentException] { s + 1L }
    assert(err.getMessage.contains("'s'"))
  }

  test("zip-internal column names are rejected, not shadowed") {
    val bad = TFrame(Seq(1L).toDF("__idx"))
    val err = intercept[IllegalArgumentException] { bad + bad }
    assert(err.getMessage.contains("__idx"))
  }

  test("frame-frame length mismatch raises (the reference asserts len)") {
    val short = TFrame(Seq(1L, 2L).toDF("a"))
    val err = intercept[Exception] { longs(c + short) }
    assert(err.getMessage.contains("different lengths"))
  }

  test("bool columns promote through the lattice (True + 1 == 2)") {
    val b = TFrame(Seq(true, false).toDF("a"))
    val out = b + 1L
    assert(out.df.schema.head.dataType === LongType)
    assert(longs(out) === Seq(2L, 1L))
  }

  test("bool-bool ops run the Python fallback: int math coerced back " +
      "to boolean (numerical_column_cpu.py:261-277)") {
    val t = TFrame(Seq(true, true, false).toDF("a"))
    val f = TFrame(Seq(true, false, false).toDF("a"))
    // True+True=2 -> True, True+False=1 -> True, False+False=0 -> False
    val sum = t + f
    assert(sum.df.schema.head.dataType === BooleanType)
    assert(bools(sum) === Seq(true, true, false))
    // True-True=0 -> False; False-True=-1 -> True (nonzero coerces True)
    assert(bools(t - f) === Seq(false, true, false))
    assert(bools(TFrame(Seq(false).toDF("a")) -
      TFrame(Seq(true).toDF("a"))) === Seq(true))
    assert(bools(t * f) === Seq(true, false, false))
    // pow: True**False = 1 -> True, False**False = 0**0 = 1 -> True,
    // False**True = 0 -> False
    assert(bools(t.pow(f)) === Seq(true, true, true))
    assert(bools(f.pow(t)) === Seq(true, false, true))
    // scalar form takes the same fallback
    assert(bools(t + true) === Seq(true, true, true))
    assert(bools(t * false) === Seq(false, false, false))
  }

  test("bool truediv is float64 with /0 -> null " +
      "(inumerical_column.py:448-459)") {
    val t = TFrame(Seq(true, true, false).toDF("a"))
    val f = TFrame(Seq(true, false, true).toDF("a"))
    val q = t / f
    assert(q.df.schema.head.dataType === DoubleType)
    val got = q.df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(got === Seq(1.0, null, 0.0))
    // bool / int scalar also falls back -> float64 (not the velox
    // int/int float32 path)
    assert((t / 2L).df.schema.head.dataType === DoubleType)
    assert(doubles(t / 2L) === Seq(0.5, 0.5, 0.0))
  }

  test("neg rejects string and bool columns with a clean error") {
    val s = TFrame(Seq((1L, "x")).toDF("i", "s"))
    val err = intercept[IllegalArgumentException] { -s }
    assert(err.getMessage.contains("'s'"))
    val b = TFrame(Seq(true).toDF("a"))
    val errB = intercept[IllegalArgumentException] { -b }
    assert(errB.getMessage.contains("arithmetic"))
  }

  test("comparisons validate types: string vs numeric raises instead " +
      "of an all-null column") {
    val s = TFrame(Seq((1L, "x")).toDF("i", "s"))
    val err = intercept[IllegalArgumentException] { s.gt(1L) }
    assert(err.getMessage.contains("not comparable"))
    // string vs string compares lexicographically
    val t = TFrame(Seq("a", "c").toDF("s"))
    assert(bools(t.lt("b")) === Seq(true, false))
    // frame form validates positionally-zipped dtypes too
    val errF = intercept[IllegalArgumentException] {
      s.lt(TFrame(Seq((1L, 2L)).toDF("i", "j")))
    }
    assert(errF.getMessage.contains("not comparable"))
    // bool vs int compares on the promoted type
    val b = TFrame(Seq(true, false).toDF("a"))
    assert(bools(b.gt(0L)) === Seq(true, false))
  }
}
