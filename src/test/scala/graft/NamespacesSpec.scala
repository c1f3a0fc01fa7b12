package graft

import org.apache.spark.sql.functions._

import graft.frame.namespaces._
import graft.types._

/** str/list/maps namespaces + arithmetic semantics + dtype lattice. */
class NamespacesSpec extends SparkSpec {
  import spark.implicits._

  test("str namespace (istring_column.py:32-239)") {
    val df = Seq("what a wonderful world!", "really?").toDF("s")
    val s = col("s")
    assert(col0(df.select(s.str.length)) === Seq(23, 7))
    assert(col0(df.select(s.str.slice(0, 4))) === Seq("what", "real"))
    assert(col0(df.select(s.str.split(" ").list.length)) === Seq(4, 1))
    assert(col0(df.select(s.str.upper)) ===
      Seq("WHAT A WONDERFUL WORLD!", "REALLY?"))
    assert(col0(df.select(s.str.find("a"))) === Seq(2, 2))
    assert(col0(df.select(s.str.countSub("l"))) === Seq(2, 2))
    assert(col0(df.select(s.str.startswith("what"))) === Seq(true, false))
    assert(col0(df.select(s.str.replace("world", "word"))) ===
      Seq("what a wonderful word!", "really?"))
    assert(col0(df.select(s.str.matchRe("w.*"))) === Seq(true, false))
    assert(col0(df.select(s.str.contains("rea"))) === Seq(false, true))
  }

  test("list namespace incl. vmap (ilist_column.py:105-182)") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(5L, 8L), Seq(13L)).toDF("l")
    val l = col("l")
    assert(col0(df.select(l.list.length)) === Seq(3, 2, 1))
    assert(col0(df.select(l.list.get(0))) === Seq(1L, 5L, 13L))
    assert(col0(df.select(l.list.slice(0, 2)))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(1L, 2L), Seq(5L, 8L), Seq(13L)))
    assert(col0(df.select(l.list.vmap(_ * 2)))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(2L, 4L, 6L), Seq(10L, 16L), Seq(26L)))
    assert(col0(df.select(l.list.filterElems(_ > 2L)))
      .map(_.asInstanceOf[Seq[Long]]) ===
      Seq(Seq(3L), Seq(5L, 8L), Seq(13L)))
    assert(col0(df.select(l.list.reduceElems(lit(0L), _ + _))) ===
      Seq(6L, 13L, 13L))
    val strs = Seq(Seq("hello", "world")).toDF("l")
    assert(col0(strs.select(col("l").list.join(" "))) === Seq("hello world"))
  }

  test("maps namespace (imap_column.py:82-91)") {
    val df = Seq(Map("a" -> 1L, "b" -> 2L)).toDF("m")
    val m = col("m")
    assert(col0(df.select(m.maps.keys)).head.asInstanceOf[Seq[String]]
      .toSet === Set("a", "b"))
    assert(col0(df.select(m.maps.get(lit("b"), lit(-1L)))) === Seq(2L))
    assert(col0(df.select(m.maps.get(lit("z"), lit(-1L)))) === Seq(-1L))
  }

  test("truediv: zero divisor yields ±inf/nan, not null (§2.9)") {
    val df = Seq((1.0, 0.0), (-1.0, 0.0), (0.0, 0.0), (6.0, 3.0))
      .toDF("a", "b")
    val got = col0(df.select(col("a").arith.truediv(col("b"))))
      .map(_.asInstanceOf[Double])
    assert(got(0).isPosInfinity)
    assert(got(1).isNegInfinity)
    assert(got(2).isNaN)
    assert(got(3) === 2.0)
  }

  test("floordiv rounds toward -inf (numeric_functions.h:28-101)") {
    val df = Seq((-7L, 2L), (7L, 2L), (-7L, -2L)).toDF("a", "b")
    assert(col0(df.select(col("a").arith.floordivInt(col("b")))) ===
      Seq(-4L, 3L, 3L))
  }

  test("floormod takes divisor sign (Python %)") {
    val df = Seq((-7L, 3L), (7L, -3L), (7L, 3L)).toDF("a", "b")
    assert(col0(df.select(col("a").arith.floormod(col("b")))) ===
      Seq(2L, -2L, 1L))
  }

  test("floormod int % 0 raises ZeroDivisionError " +
      "(numerical_column_cpu.py:420-434)") {
    val df = Seq((7L, 0L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(col("a").arith.floormod(col("b"))).collect()
    }
    assert(e.getMessage.contains(
      "ZeroDivisionError: integer division or modulo by zero"))
  }

  test("floormodFloat: divisor sign, % 0.0 -> NaN " +
      "(numerical_column_cpu.py:425-427)") {
    val df = Seq((-7.0, 3.0), (7.0, -3.0), (7.0, 0.0)).toDF("a", "b")
    val got = col0(df.select(col("a").arith.floormodFloat(col("b"))))
      .map(_.asInstanceOf[Double])
    assert(got(0) === 2.0)
    assert(got(1) === -2.0)
    assert(got(2).isNaN)
  }

  test("powInt stays integral (numeric_functions.h:103-138)") {
    val df = Seq((2L, 10L)).toDF("a", "b")
    assert(col0(df.select(col("a").arith.powInt(col("b")))) === Seq(1024L))
  }

  test("mapDict pins the reference's dict-map examples " +
      "(icolumn.py:456-476)") {
    import graft.functions.Functional
    val df = Seq[java.lang.Long](1L, 2L, null, 4L).toDF("x")
    def got(c: org.apache.spark.sql.Column): Seq[Any] = col0(df.select(c))
    // plain dict: non-mapped and null -> null
    assert(got(Functional.mapDict(col("x"), Map(1L -> 111L))) ===
      Seq(111L, null, null, null))
    // defaultdict: default fills non-mapped AND null inputs
    assert(got(Functional.mapDict(col("x"), Map(1L -> 111L),
      default = Some(-1L))) === Seq(111L, -1L, -1L, -1L))
    // na_action='ignore': null dodges the dict and the default
    assert(got(Functional.mapDict(col("x"), Map(1L -> 111L),
      default = Some(-1L), naAction = Some("ignore"))) ===
      Seq(111L, -1L, null, -1L))
    // value-type change (map to strings)
    assert(got(Functional.mapDict(col("x"), Map(1L -> "one", 4L -> "four"))) ===
      Seq("one", null, null, "four"))
  }

  test("promotion lattice (dtypes.py:356-378)") {
    assert(Dtype.promote(TInt8(), TInt64()) === Some(TInt64()))
    assert(Dtype.promote(TInt64(), TFloat32()) === Some(TFloat32()))
    assert(Dtype.promote(TBoolean(), TInt8(nullable = true)) ===
      Some(TInt8(nullable = true)))
    // column-scalar: column int width wins (column.h:132-216)
    assert(Dtype.promoteColumnScalar(TInt32(), TInt64()) === Some(TInt32()))
    assert(Dtype.promoteColumnScalar(TInt32(), TFloat64()) ===
      Some(TFloat64()))
  }

  test("commonDtype recursion (dtypes.py:381-422)") {
    assert(Dtype.commonDtype(TList(TInt8()), TList(TFloat32())) ===
      Some(TList(TFloat32())))
    assert(Dtype.commonDtype(TVoid, TStringT()) ===
      Some(TStringT(nullable = true)))
    val s1 = TStruct(Seq(TField("x", TInt8())))
    val s2 = TStruct(Seq(TField("x", TInt64())))
    assert(Dtype.commonDtype(s1, s2) ===
      Some(TStruct(Seq(TField("x", TInt64())))))
  }

  test("prefix inference (dtypes.py:270,314-326)") {
    assert(Dtype.inferFromSeq(Seq(1L, 2L, 3L)) === TInt64())
    assert(Dtype.inferFromSeq(Seq[Any](1L, null, 3L)) ===
      TInt64(nullable = true))
    assert(Dtype.inferFromSeq(Seq(1.5f, 2.5f)) === TFloat32())
    assert(Dtype.inferFromSeq(Seq(Seq(1L), Seq(2L))) === TList(TInt64()))
  }
}
