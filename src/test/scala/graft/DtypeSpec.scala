package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types._

/** Pins the reference's dtype-surface tests (test/test_dtypes.py) on
  * our Dtype system: Arrow typecodes, nullability defaults, the
  * serialization round-trip (Java serialization as the pickle analog
  * — Dtypes ship to executors inside task closures, so this is a real
  * contract), and Spark-DataType conversion as the analog of
  * `dtype_of_velox_type` (test_dtypes.py:111-140). */
class DtypeSpec extends AnyFunSuite {

  test("Arrow typecodes match the reference (test_dtypes.py:32-63)") {
    assert(TInt64().typecode === "l")
    assert(TStringT().typecode === "u")
    assert(TList(TInt64(nullable = true)).typecode === "+l")
    assert(TMapT(TInt64(), TStringT()).typecode === "+m")
    assert(TStruct(Seq(TField("a", TInt64()),
      TField("b", TStringT()))).typecode === "+s")
    // the full scalar row (dtypes_core.py:80 table)
    assert(Seq(TBoolean(), TInt8(), TInt16(), TInt32(), TFloat32(),
      TFloat64()).map(_.typecode) === Seq("b", "c", "s", "i", "f", "g"))
  }

  test("nullability defaults false; explicit nullable sticks " +
      "(test_dtypes.py:41-43)") {
    assert(!TStringT().nullable)
    assert(TStringT(nullable = true).nullable)
    assert(Dtype.isNumerical(TInt64()))
    assert(Dtype.isNumerical(TFloat32()))
    assert(!Dtype.isNumerical(TBoolean()))
    assert(!Dtype.isNumerical(TStringT()))
  }

  test("serialization round-trips the reference matrix " +
      "(test_dtypes.py:65-110, pickle analog)") {
    def roundTrip(d: Dtype): Dtype = {
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(d)
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[Dtype]
    }
    for (n <- Seq(true, false)) {
      for (d <- Seq[Dtype](TInt8(n), TInt16(n), TInt32(n), TInt64(n),
          TFloat32(n), TFloat64(n), TStringT(n)))
        assert(roundTrip(d) === d, d)
      for (d <- Seq[Dtype](
          TList(TInt64(), n),
          TList(TList(TStringT(), n)),
          TMapT(TStringT(), TInt64(n)),
          TMapT(TStringT(), TList(TInt64()), n)))
        assert(roundTrip(d) === d, d)
    }
    // the nested Criteo-shaped struct from the reference test
    val criteo = TStruct(Seq(
      TField("label", TInt8()),
      TField("dense_features", TStruct(
        (1 to 3).map(i => TField(s"int_$i", TInt32(nullable = true)))))))
    assert(roundTrip(criteo) === criteo)
  }

  test("Spark type conversion is the dtype_of_velox_type analog " +
      "(test_dtypes.py:111-140)") {
    // array(array(varchar)) -> List(List(String))
    val arr = Dtype.fromSpark(
      ArrayType(ArrayType(StringType, true), true), nullable = false)
    assert(arr.isInstanceOf[TList])
    val inner = arr.asInstanceOf[TList].item
    assert(inner.isInstanceOf[TList])
    assert(inner.asInstanceOf[TList].item.isInstanceOf[TStringT])
    // map(varchar, bigint)
    val m = Dtype.fromSpark(MapType(StringType, LongType, true))
    assert(m.isInstanceOf[TMapT])
    assert(m.asInstanceOf[TMapT].key.isInstanceOf[TStringT])
    assert(m.asInstanceOf[TMapT].item === TInt64(nullable = true))
    // row(c0 varchar, c1 bigint) with nullable fields
    val row = Dtype.fromSpark(StructType(Seq(
      StructField("c0", StringType, true),
      StructField("c1", LongType, true))))
    assert(row === TStruct(Seq(
      TField("c0", TStringT(nullable = true)),
      TField("c1", TInt64(nullable = true)))))
  }

  test("spark -> dtype -> spark is the identity on schema shape") {
    val schema = StructType(Seq(
      StructField("a", LongType, false),
      StructField("b", ArrayType(StringType, true), true),
      StructField("c", MapType(StringType, DoubleType, true), true),
      StructField("d", StructType(Seq(
        StructField("x", IntegerType, true))), true)))
    val roundTripped = Dtype.fromSpark(schema).spark
    assert(roundTripped === schema)
  }

  test("a nullable struct requires all-nullable fields " +
      "(dtypes_core.py:277-283)") {
    intercept[IllegalArgumentException] {
      TStruct(Seq(TField("a", TInt64())), nullable = true)
    }
  }
}
