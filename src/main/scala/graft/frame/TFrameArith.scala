package graft.frame

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{Dtype, TBoolean, TFloat32}
import graft.frame.namespaces._

/** §2.9 frame-level broadcast arithmetic and comparison lifting — the
  * reference's DataFrame operator surface
  * (velox_rt/dataframe_cpu.py:624-1490; battery
  * test/test_dataframe.py:452-723):
  *
  *  - `df + 2` (and -,*,/,floordiv,mod,pow + reverse forms) applies the
  *    op to EVERY column with the reference's column-scalar promotion
  *    (column int width wins, Dtype.promoteColumnScalar); a non-numeric
  *    column is an error, like the reference's TypeError.
  *  - `df1 + df2` zips columns POSITIONALLY — field i with field i,
  *    keeping self's names, lengths must match (the reference asserts
  *    len equality). In a distributed engine positional alignment is a
  *    real operation, not a pointer zip: both sides are indexed with
  *    zipWithIndex and hash-joined on the synthetic index. That is two
  *    extra scans and a shuffle — faithful to the reference's
  *    semantics, but at scale prefer an explicit keyed join + select;
  *    this form exists for API parity and derived-frame arithmetic.
  *  - comparisons (eqv/neq/lt/le/gt/ge) lift the same two ways and
  *    return an all-boolean frame; `-df` negates per column.
  *
  * Per-column semantics reuse ArithOps (truediv ÷0 → ±inf/NaN, int
  * floordiv/mod ÷0 raises, divisor-sign mod, int**int stays int) so the
  * frame surface and the column surface cannot drift apart. int/int
  * truediv yields float32 — the reference multiplies by a Python float
  * (→ velox REAL) before dividing (numerical_column_cpu.py:394-399).
  */
trait TFrameArith { self: TFrame =>

  // ---- scalar forms ----------------------------------------------------

  def +(v: Any): TFrame = liftScalar("add", v, colLeft = true)
  def -(v: Any): TFrame = liftScalar("sub", v, colLeft = true)
  def *(v: Any): TFrame = liftScalar("mul", v, colLeft = true)
  def /(v: Any): TFrame = liftScalar("truediv", v, colLeft = true)
  def floordiv(v: Any): TFrame = liftScalar("floordiv", v, colLeft = true)
  def mod(v: Any): TFrame = liftScalar("mod", v, colLeft = true)
  def pow(v: Any): TFrame = liftScalar("pow", v, colLeft = true)

  /** Reverse (r-) forms: scalar OP column (dataframe_cpu.py:662-680). */
  def radd(v: Any): TFrame = liftScalar("add", v, colLeft = false)
  def rsub(v: Any): TFrame = liftScalar("sub", v, colLeft = false)
  def rmul(v: Any): TFrame = liftScalar("mul", v, colLeft = false)
  def rtruediv(v: Any): TFrame = liftScalar("truediv", v, colLeft = false)
  def rfloordiv(v: Any): TFrame = liftScalar("floordiv", v, colLeft = false)
  def rmod(v: Any): TFrame = liftScalar("mod", v, colLeft = false)
  def rpow(v: Any): TFrame = liftScalar("pow", v, colLeft = false)

  /** Per-column negation. Non-numeric columns raise like every other
    * frame op (the reference's velox neg has no bool/string kernel and
    * no Python fallback for unary ops) — without the check Spark would
    * implicitly cast a string column to double and hand back silently
    * corrupted strings. */
  def unary_- : TFrame = TFrame(df.select(columns.map { n =>
    val d = fieldDtype(df, n)
    if (!Dtype.isNumerical(d))
      throw new IllegalArgumentException(
        s"frame neg: column '$n' ($d) does not support arithmetic")
    (-df(n)).cast(df.schema(n).dataType).as(n)
  }: _*))

  def eqv(v: Any): TFrame = liftScalarCmp(v)(_ === _)
  def neq(v: Any): TFrame = liftScalarCmp(v)(_ =!= _)
  def lt(v: Any): TFrame = liftScalarCmp(v)(_ < _)
  def le(v: Any): TFrame = liftScalarCmp(v)(_ <= _)
  def gt(v: Any): TFrame = liftScalarCmp(v)(_ > _)
  def ge(v: Any): TFrame = liftScalarCmp(v)(_ >= _)

  // ---- frame forms (positional) ----------------------------------------

  def +(other: TFrame): TFrame = liftFrame("add", other)
  def -(other: TFrame): TFrame = liftFrame("sub", other)
  def *(other: TFrame): TFrame = liftFrame("mul", other)
  def /(other: TFrame): TFrame = liftFrame("truediv", other)
  def floordiv(other: TFrame): TFrame = liftFrame("floordiv", other)
  def mod(other: TFrame): TFrame = liftFrame("mod", other)
  def pow(other: TFrame): TFrame = liftFrame("pow", other)

  def eqv(other: TFrame): TFrame = liftFrameCmp(other)(_ === _)
  def neq(other: TFrame): TFrame = liftFrameCmp(other)(_ =!= _)
  def lt(other: TFrame): TFrame = liftFrameCmp(other)(_ < _)
  def le(other: TFrame): TFrame = liftFrameCmp(other)(_ <= _)
  def gt(other: TFrame): TFrame = liftFrameCmp(other)(_ > _)
  def ge(other: TFrame): TFrame = liftFrameCmp(other)(_ >= _)

  // ---- plumbing ----------------------------------------------------------

  private def fieldDtype(d: DataFrame, n: String): Dtype =
    Dtype.fromSpark(d.schema(n).dataType, d.schema(n).nullable)

  /** The shared per-column kernel. `l OP r` with dtypes (dl, dr);
    * `colD`/`otherD` feed the promotion rule: promoteColumnScalar when
    * the other side is a scalar, plain lattice promote otherwise. */
  private def arithKernel(op: String, l: Column, r: Column,
      dl: Dtype, dr: Dtype, scalar: Boolean, colD: Dtype, otherD: Dtype,
      name: String): Column = {
    val promoted = (if (scalar) Dtype.promoteColumnScalar(colD, otherD)
      else Dtype.promote(dl, dr)).getOrElse(throw new IllegalArgumentException(
      s"frame $op: column '$name' ($colD) does not support arithmetic " +
        s"with $otherD"))
    val bothInt = isIntLike(dl) && isIntLike(dr)
    // bool-bool ops (and any bool-column-vs-scalar op) bypass velox in
    // the reference and run the plain Python operator
    // (numerical_column_cpu.py:261-277 should_use_py_impl): compute on
    // int64 like Python ints, then coerce the result back through the
    // promoted dtype — for bool-bool that target is boolean, and the
    // reference's FromPySequence converts nonzero ints to True
    // (test_numerical_column.py:816-819), which is exactly Spark's
    // long→boolean cast. truediv under the fallback is special-cased
    // below: always float64, divisor 0 → null
    // (inumerical_column.py:448-459).
    val bothBool = dl.isInstanceOf[TBoolean] && dr.isInstanceOf[TBoolean]
    val pyFallback = bothBool || (scalar && colD.isInstanceOf[TBoolean])
    val computeT = if (bothBool) LongType else promoted.spark
    val lc = if (dl.isInstanceOf[TBoolean]) l.cast(computeT) else l
    val rc = if (dr.isInstanceOf[TBoolean]) r.cast(computeT) else r
    if (op == "truediv" && pyFallback) {
      return when(rc.cast(DoubleType) === 0.0, lit(null))
        .otherwise(lc.cast(DoubleType) / rc.cast(DoubleType))
        .cast(graft.types.TFloat64(true).spark).as(name)
    }
    val out = op match {
      case "add" => lc + rc
      case "sub" => lc - rc
      case "mul" => lc * rc
      case "truediv" => lc.arith.truediv(rc)
      case "floordiv" =>
        if (bothInt) lc.arith.floordivInt(rc) else lc.arith.floordiv(rc)
      case "mod" =>
        if (bothInt) lc.arith.floormod(rc) else lc.arith.floormodFloat(rc)
      case "pow" =>
        if (bothInt) lc.arith.powInt(rc)
        else org.apache.spark.sql.functions.pow(
          lc.cast(DoubleType), rc.cast(DoubleType))
    }
    // truediv never keeps an int type: int/int is float32 (the
    // reference's `* 1.0` forces velox REAL first)
    val outD =
      if (op == "truediv" && bothInt) TFloat32(promoted.nullable) else promoted
    out.cast(outD.spark).as(name)
  }

  private def isIntLike(d: Dtype): Boolean =
    (Dtype.isNumerical(d) && !d.isInstanceOf[TFloat32] &&
      !d.isInstanceOf[graft.types.TFloat64]) || d.isInstanceOf[TBoolean]

  private def liftScalar(op: String, v: Any, colLeft: Boolean): TFrame = {
    val ds = Dtype.inferFromValue(v)
    TFrame(df.select(columns.map { n =>
      val dc = fieldDtype(df, n)
      val (l, r, dl, dr) =
        if (colLeft) (df(n), lit(v), dc, ds) else (lit(v), df(n), ds, dc)
      arithKernel(op, l, r, dl, dr, scalar = true, dc, ds, n)
    }: _*))
  }

  /** Comparison operand validation: numeric/bool pairs compare on
    * their promoted type, strings compare with strings; anything else
    * raises like the reference's TypeError — without the check Spark's
    * implicit string→numeric cast turns a mismatched comparison into
    * an all-NULL column instead of the documented all-boolean frame. */
  private def cmpOperands(l: Column, r: Column, dl: Dtype, dr: Dtype,
      name: String): (Column, Column) = {
    val bothStr = dl.isInstanceOf[graft.types.TStringT] &&
      dr.isInstanceOf[graft.types.TStringT]
    if (bothStr) (l, r)
    else {
      val promoted = Dtype.promote(dl, dr).getOrElse(
        throw new IllegalArgumentException(
          s"frame cmp: column '$name' ($dl) is not comparable with $dr"))
      (l.cast(promoted.spark), r.cast(promoted.spark))
    }
  }

  private def liftScalarCmp(v: Any)(cmp: (Column, Column) => Column): TFrame = {
    val ds = Dtype.inferFromValue(v)
    TFrame(df.select(columns.map { n =>
      val (l, r) = cmpOperands(df(n), lit(v), fieldDtype(df, n), ds, n)
      cmp(l, r).as(n)
    }: _*))
  }

  /** Positional column zip: self columns keep their names, `other`'s
    * land as __r_0..__r_n in field order. Row i of self meets row i of
    * other — enforced length equality (a mismatch raises inside the
    * join pass, no extra count jobs). Only the index assignment runs
    * on the RDD (zipWithIndex — the one positional primitive Spark
    * has); the join itself is a DataFrame full-outer on the index so
    * the shuffle stays in Tungsten instead of Java-serializing rows. */
  private[frame] def zipFrames(other: TFrame): DataFrame = {
    require(columns.length == other.columns.length,
      s"frame op: column counts differ (${columns.length} vs " +
        s"${other.columns.length})")
    // same guard class as saltedJoin's __salt check: the zip plumbing
    // owns the __idx/__lm/__rm/__r_i names — a caller column with one
    // of them would be silently shadowed in the join
    val reserved = columns.filter(n => n == "__idx" || n == "__lm" ||
      n == "__rm" || n == "__chk" || n.matches("__r_\\d+"))
    require(reserved.isEmpty,
      s"frame op: input columns $reserved collide with zip-internal " +
        "names (__idx/__lm/__rm/__chk/__r_N); rename them first")
    def indexed(d: DataFrame, rename: Int => Option[String]): DataFrame = {
      val fields = StructField("__idx", LongType, nullable = false) +:
        d.schema.fields.zipWithIndex.map { case (f, i) =>
          rename(i).map(n => f.copy(name = n)).getOrElse(f)
        }
      d.sparkSession.createDataFrame(
        d.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(i +: r.toSeq) },
        StructType(fields))
    }
    val l = indexed(df, _ => None).withColumn("__lm", lit(true))
    val r = indexed(other.df, i => Some(s"__r_$i"))
      .withColumn("__rm", lit(true))
    l.join(r, Seq("__idx"), "full_outer")
      .withColumn("__chk",
        when(col("__lm").isNull || col("__rm").isNull, raise_error(lit(
          "frame op: frames have different lengths — the reference " +
            "asserts len(self) == len(other)"))).otherwise(lit(true)))
      .where(col("__chk"))
      .drop("__idx", "__lm", "__rm", "__chk")
  }

  private def liftFrame(op: String, other: TFrame): TFrame = {
    val z = zipFrames(other)
    TFrame(z.select(columns.zipWithIndex.map { case (n, i) =>
      val dl = fieldDtype(df, n)
      val dr = fieldDtype(other.df, other.columns(i))
      arithKernel(op, z(n), z(s"__r_$i"), dl, dr, scalar = false, dl, dr, n)
    }: _*))
  }

  private def liftFrameCmp(other: TFrame)(
      cmp: (Column, Column) => Column): TFrame = {
    val z = zipFrames(other)
    TFrame(z.select(columns.zipWithIndex.map { case (n, i) =>
      val (l, r) = cmpOperands(z(n), z(s"__r_$i"),
        fieldDtype(df, n), fieldDtype(other.df, other.columns(i)), n)
      cmp(l, r).as(n)
    }: _*))
  }
}
