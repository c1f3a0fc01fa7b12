package graft.types

import org.apache.spark.sql.types._

/** Dtype ADT mirroring the reference's type system (dtypes_core.py:48-342,
  * dtypes.py:42-123): frozen, structural equality, per-type nullability,
  * Arrow typecodes; no date/time/decimal/unsigned types (dtypes_core.py:80,
  * :148-150). Bridges to Spark's DataType.
  */
sealed trait Dtype {
  def nullable: Boolean
  def typecode: String
  def spark: DataType
  def withNull(n: Boolean = true): Dtype
}

final case class TBoolean(nullable: Boolean = false) extends Dtype {
  val typecode = "b"; def spark = BooleanType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TInt8(nullable: Boolean = false) extends Dtype {
  val typecode = "c"; def spark = ByteType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TInt16(nullable: Boolean = false) extends Dtype {
  val typecode = "s"; def spark = ShortType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TInt32(nullable: Boolean = false) extends Dtype {
  val typecode = "i"; def spark = IntegerType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TInt64(nullable: Boolean = false) extends Dtype {
  val typecode = "l"; def spark = LongType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TFloat32(nullable: Boolean = false) extends Dtype {
  val typecode = "f"; def spark = FloatType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TFloat64(nullable: Boolean = false) extends Dtype {
  val typecode = "g"; def spark = DoubleType
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TStringT(nullable: Boolean = false) extends Dtype {
  val typecode = "u"; def spark = StringType
  def withNull(n: Boolean) = copy(nullable = n)
}
/** fixedSize = -1 means variable length (dtypes_core.py:215-238); Spark
  * has no fixed-size arrays — enforced via a runtime check expression. */
final case class TList(item: Dtype, nullable: Boolean = false,
    fixedSize: Int = -1) extends Dtype {
  val typecode = "+l"
  def spark = ArrayType(item.spark, item.nullable)
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TMapT(key: Dtype, item: Dtype, nullable: Boolean = false)
    extends Dtype {
  val typecode = "+m"
  def spark = MapType(key.spark, item.spark, item.nullable)
  def withNull(n: Boolean) = copy(nullable = n)
}
final case class TField(name: String, dtype: Dtype)
/** A nullable struct requires every field nullable (dtypes_core.py:277-283). */
final case class TStruct(fields: Seq[TField], nullable: Boolean = false)
    extends Dtype {
  if (nullable) require(fields.forall(_.dtype.nullable),
    "nullable struct requires all fields nullable")
  val typecode = "+s"
  def spark = StructType(fields.map(f =>
    StructField(f.name, f.dtype.spark, f.dtype.nullable)))
  def withNull(n: Boolean) = copy(nullable = n)
  def get(name: String): Option[Dtype] =
    fields.find(_.name == name).map(_.dtype)
}
case object TVoid extends Dtype {
  val nullable = true; val typecode = "n"; def spark = NullType
  def withNull(n: Boolean) = this
}

object Dtype {

  /** Promotion lattice bool < int8 < int16 < int32 < int64 < float32 <
    * float64 (dtypes.py:356-378). */
  private val lattice: Map[Class[_], Int] = Map(
    classOf[TBoolean] -> 0, classOf[TInt8] -> 1, classOf[TInt16] -> 2,
    classOf[TInt32] -> 3, classOf[TInt64] -> 4, classOf[TFloat32] -> 5,
    classOf[TFloat64] -> 6)

  private def ofRank(rank: Int, n: Boolean): Dtype = rank match {
    case 0 => TBoolean(n); case 1 => TInt8(n); case 2 => TInt16(n)
    case 3 => TInt32(n); case 4 => TInt64(n); case 5 => TFloat32(n)
    case 6 => TFloat64(n)
  }

  def isNumerical(d: Dtype): Boolean = lattice.contains(d.getClass) &&
    !d.isInstanceOf[TBoolean]

  /** Column-column promotion: least upper bound on the lattice
    * (dtypes.py:356-378). */
  def promote(a: Dtype, b: Dtype): Option[Dtype] =
    for {
      ra <- lattice.get(a.getClass)
      rb <- lattice.get(b.getClass)
    } yield ofRank(math.max(ra, rb), a.nullable || b.nullable)

  /** Column-scalar promotion: the column's int width wins for int-int
    * (reference column.h:132-216 — "respect the column type"). */
  def promoteColumnScalar(col: Dtype, scalar: Dtype): Option[Dtype] = {
    val intRanks = 1 to 4
    (lattice.get(col.getClass), lattice.get(scalar.getClass)) match {
      case (Some(rc), Some(rs))
          if intRanks.contains(rc) && intRanks.contains(rs) =>
        Some(ofRank(rc, col.nullable || scalar.nullable))
      case _ => promote(col, scalar)
    }
  }

  /** Recursive common dtype over lists/maps/structs (dtypes.py:381-422). */
  def commonDtype(a: Dtype, b: Dtype): Option[Dtype] = (a, b) match {
    case (TVoid, x) => Some(x.withNull())
    case (x, TVoid) => Some(x.withNull())
    case (TStringT(n1), TStringT(n2)) => Some(TStringT(n1 || n2))
    case (TList(i1, n1, f1), TList(i2, n2, f2)) =>
      commonDtype(i1, i2).map(i =>
        TList(i, n1 || n2, if (f1 == f2) f1 else -1))
    case (TMapT(k1, v1, n1), TMapT(k2, v2, n2)) =>
      for { k <- commonDtype(k1, k2); v <- commonDtype(v1, v2) }
        yield TMapT(k, v, n1 || n2)
    case (TStruct(f1, n1), TStruct(f2, n2)) if f1.map(_.name) == f2.map(_.name) =>
      val items = f1.zip(f2).map { case (x, y) =>
        commonDtype(x.dtype, y.dtype).map(TField(x.name, _))
      }
      if (items.forall(_.isDefined)) Some(TStruct(items.flatten, n1 || n2))
      else None
    case _ => promote(a, b)
  }

  /** Infer from a single Scala value. JVM convention: Double → float64,
    * Int/Long → int64 (the reference's Python float→float32 rule,
    * dtypes.py:639-643, applies to its Python surface; floats from our
    * Float literals stay float32). */
  def inferFromValue(v: Any): Dtype = v match {
    case null => TVoid
    case _: Boolean => TBoolean()
    case _: Byte => TInt8()
    case _: Short => TInt16()
    case _: Int => TInt64()
    case _: Long => TInt64()
    case _: Float => TFloat32()
    case _: Double => TFloat64()
    case _: String => TStringT()
    case s: Seq[_] =>
      TList(s.map(inferFromValue).reduceOption((x, y) =>
        commonDtype(x, y).getOrElse(
          throw new IllegalArgumentException(s"no common dtype in list")))
        .getOrElse(TVoid))
    case m: Map[_, _] =>
      val ks = m.keys.map(inferFromValue)
        .reduceOption((x, y) => commonDtype(x, y).get).getOrElse(TVoid)
      val vs = m.values.map(inferFromValue)
        .reduceOption((x, y) => commonDtype(x, y).get).getOrElse(TVoid)
      TMapT(ks, vs)
    case p: Product =>
      TStruct(p.productIterator.zipWithIndex.map { case (x, i) =>
        TField(s"f_$i", inferFromValue(x))
      }.toSeq)
    case other =>
      throw new IllegalArgumentException(s"cannot infer dtype of $other")
  }

  /** Prefix-based inference: LUB over the first `prefixLength` items
    * (dtypes.py:270,314-326); null anywhere in the prefix → nullable. */
  val PrefixLength = 5
  def inferFromSeq(xs: Seq[Any], prefixLength: Int = PrefixLength): Dtype = {
    val prefix = xs.take(prefixLength)
    val d = prefix.map(inferFromValue).foldLeft(TVoid: Dtype)((acc, x) =>
      commonDtype(acc, x).getOrElse(throw new IllegalArgumentException(
        s"no common dtype for prefix $prefix")))
    // the TVoid fold seed forces nullable=true; nullability is decided
    // solely by whether the prefix actually contains a null
    d.withNull(prefix.contains(null))
  }

  /** Spark DataType → Dtype. */
  def fromSpark(dt: DataType, nullable: Boolean = false): Dtype = dt match {
    case BooleanType => TBoolean(nullable)
    case ByteType => TInt8(nullable)
    case ShortType => TInt16(nullable)
    case IntegerType => TInt32(nullable)
    case LongType => TInt64(nullable)
    case FloatType => TFloat32(nullable)
    case DoubleType => TFloat64(nullable)
    case StringType => TStringT(nullable)
    case ArrayType(e, cn) => TList(fromSpark(e, cn), nullable)
    case MapType(k, v, cn) =>
      TMapT(fromSpark(k), fromSpark(v, cn), nullable)
    case StructType(fs) =>
      TStruct(fs.toSeq.map(f =>
        TField(f.name, fromSpark(f.dataType, f.nullable))), nullable)
    case NullType => TVoid
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type $other")
  }
}
