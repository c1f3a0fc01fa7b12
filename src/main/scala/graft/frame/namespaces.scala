package graft.frame

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional

/** `col.str.*` / `col.list.*` / `col.maps.*` method namespaces and the
  * reference's arithmetic semantics (§2.9-2.12), as implicit syntax on
  * Column. Everything lowers to Spark built-ins / HOFs; the handful of
  * Python-semantics predicates go through the codegen kernels.
  */
object namespaces {

  implicit final class GraftColumn(private val c: Column) extends AnyVal {
    def str: StrOps = new StrOps(c)
    def list: ListOps = new ListOps(c)
    def maps: MapOps = new MapOps(c)
    def arith: ArithOps = new ArithOps(c)
  }

  /** istring_column.py:32-239 surface. */
  final class StrOps(private val c: Column) extends AnyVal {
    def length: Column = org.apache.spark.sql.functions.length(c)

    /** Python slice [start, stop) — reference slice(start, stop),
      * string_column_cpu.py:209-220 (1-based substr internally). */
    def slice(start: Int, stop: Int): Column =
      substring(c, start + 1, math.max(stop - start, 0))

    /** split on a LITERAL pattern (TorchArrow pat is not a regex —
      * string_column_cpu.py:222-228). n = max splits; n <= 0 means
      * UNLIMITED, matching the reference's velox forward (pinned at
      * test_string_column.py:99-100: split(".", 0) == full split). */
    def split(pat: String, n: Int = -1): Column =
      if (n <= 0) org.apache.spark.sql.functions
        .split(c, java.util.regex.Pattern.quote(pat))
      else org.apache.spark.sql.functions
        .split(c, java.util.regex.Pattern.quote(pat), n + 1)

    def strip: Column = trim(c)
    def lower: Column = org.apache.spark.sql.functions.lower(c)
    def upper: Column = org.apache.spark.sql.functions.upper(c)

    def isalpha: Column = Functional.isalpha(c)
    def isalnum: Column = Functional.isalnum(c)
    def isdigit: Column = Functional.isdigit(c)
    def isdecimal: Column = Functional.isdecimal(c)
    def isnumeric: Column = Functional.isnumeric(c)
    def isspace: Column = Functional.isspace(c)
    def islower: Column = Functional.islower(c)
    def isupper: Column = Functional.isupper(c)
    def istitle: Column = Functional.istitle(c)

    def startswith(pat: String): Column = c.startsWith(pat)
    def endswith(pat: String): Column = c.endsWith(pat)

    /** occurrences of a literal pattern (string_column_cpu.py:305-307). */
    def countSub(pat: String): Column =
      size(regexp_extract_all(c, lit(java.util.regex.Pattern.quote(pat)),
        lit(0)))

    /** 0-based find; -1 when missing (string_column_cpu.py:309-313). */
    def find(sub: String): Column = instr(c, sub) - 1

    /** literal replace (regex=False only, string_column_cpu.py:315-321). */
    def replace(pat: String, repl: String): Column =
      org.apache.spark.sql.functions.replace(c, lit(pat), lit(repl))

    /** re2 match anchored at start (match_re, functions.h:403-406). */
    def matchRe(pat: String): Column = regexp_like(c, lit(s"^(?:$pat)"))

    def contains(pat: String, regex: Boolean = true): Column =
      if (regex) c.rlike(pat)
      else c.contains(pat)

    def findall(pat: String): Column =
      regexp_extract_all(c, lit(pat), lit(0))

    def cat(other: Column): Column = concat(c, other)
  }

  /** ilist_column.py surface. */
  final class ListOps(private val c: Column) extends AnyVal {
    def length: Column = size(c)
    def join(sep: String): Column = array_join(c, sep)
    def get(i: Int): Column = c.getItem(i)

    /** Python slice semantics on lists (list_column_cpu.py:256-270). */
    def slice(start: Int, stop: Int): Column =
      org.apache.spark.sql.functions.slice(c, start + 1,
        math.max(stop - start, 0))

    /** vmap: vectorized per-element fn (ilist_column.py:105-140's flat
      * re-wrap trick) — exactly Spark's transform HOF. */
    def vmap(f: Column => Column): Column = transform(c, f)

    def mapElems(f: Column => Column): Column = transform(c, f)
    def filterElems(p: Column => Column): Column =
      org.apache.spark.sql.functions.filter(c, p)
    def reduceElems(zero: Column, merge: (Column, Column) => Column): Column =
      aggregate(c, zero, merge)
    def flatmapElems(f: Column => Column): Column = flatten(transform(c, f))
  }

  /** imap_column.py surface. */
  final class MapOps(private val c: Column) extends AnyVal {
    def keys: Column = map_keys(c)
    def values: Column = map_values(c)
    /** dict.get(key, fill) (imap_column.py:82-91). The fill applies to
      * a MISSING KEY only; a null map row stays null
      * (test_map_column.py:61-66: get("de", 0) over
      * [{abc:123},{de:45,fg:67},None] is [0, 45, None]). */
    def get(key: Column, fill: Column): Column =
      when(c.isNull, lit(null)).otherwise(coalesce(element_at(c, key), fill))
  }

  /** §2.9 arithmetic with the reference's semantics where Spark differs. */
  final class ArithOps(private val c: Column) extends AnyVal {

    /** `/` always float; divide-by-zero yields ±inf / nan, NOT null
      * (numerical_column_cpu.py:387-401). */
    def truediv(other: Column): Column = {
      val a = c.cast(DoubleType)
      when(other === 0.0,
        when(a > 0.0, lit(Double.PositiveInfinity))
          .when(a < 0.0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)))
        .otherwise(a / other)
    }

    /** `//` rounds toward −∞ and stays float, ±inf/nan pass through
      * (numeric_functions.h:28-101) — Spark's floor() returns LONG and
      * would overflow on ±inf, so non-finite values bypass it; int//0
      * raises like Python (numerical_column_cpu.py:353-449). */
    def floordiv(other: Column): Column = {
      val t = c.cast(DoubleType).arith.truediv(other)
      // ±0.0 passes through: floor() returns LONG, turning −0.0 into
      // +0.0, whereas std::floor (numeric_functions.h:45-52) and the
      // oracle keep the sign. |t| ≥ 2^63 is already integral and would
      // overflow the LONG; pass it through too.
      when(t.isNull || t.isNaN || t === 0.0 ||
        abs(t) >= 9.223372036854776e18 ||
        t === Double.PositiveInfinity || t === Double.NegativeInfinity, t)
        .otherwise(floor(t).cast(DoubleType))
    }

    def floordivInt(other: Column): Column =
      when(other === 0, raise_error(lit("ZeroDivisionError: integer " +
        "division or modulo by zero")))
        .otherwise(floor(c.cast(DoubleType) / other.cast(DoubleType))
          .cast(LongType))

    /** `%` with the sign of the divisor (Python), via pmod adjustment;
      * `% 0` raises ZeroDivisionError like the reference's integer mod
      * (numerical_column_cpu.py:420-434), exactly as [[floordivInt]]
      * does. Float columns wanting the reference's `nan` instead use
      * [[floormodFloat]]. */
    def floormod(other: Column): Column =
      when(other === 0, raise_error(lit("ZeroDivisionError: integer " +
        "division or modulo by zero")))
        .otherwise(((c % other) + other) % other)

    /** float `%`: divisor sign, x % 0 → NaN rather than raising — the
      * reference's float branch (numerical_column_cpu.py:425-427). */
    def floormodFloat(other: Column): Column = {
      val a = c.cast(DoubleType)
      when(other === 0.0, lit(Double.NaN))
        .otherwise(((a % other) + other) % other)
    }

    /** `**`: int ^ int stays int (torcharrow_pow_int,
      * numeric_functions.h:103-138); a NEGATIVE integer exponent
      * raises, as numpy/the reference do
      * (test_numerical_column.py:425-430). */
    def powInt(other: Column): Column =
      when(other < 0, raise_error(lit(
        "Integers to negative integer powers are not allowed")))
        .otherwise(pow(c.cast(DoubleType), other.cast(DoubleType))
          .cast(LongType))

    /** Bitwise &, |, ^, ~ on integer columns (Python int semantics,
      * test_numerical_column.py:640-647). Boolean columns use the
      * native logical operators (&&, ||, =!=, !) — same truth tables
      * the reference's bool branch pins at :630-638. */
    def bitAnd(other: Column): Column = c.bitwiseAND(other)
    def bitOr(other: Column): Column = c.bitwiseOR(other)
    def bitXor(other: Column): Column = c.bitwiseXOR(other)
    def bitNot: Column = bitwise_not(c)

    /** round(decimals) with the reference's rint-on-scaled-double
      * half-even semantics (torcharrow_round,
      * numeric_functions.h:139-160) — not Spark round/bround. */
    def round(decimals: Int = 0): Column =
      graft.functions.Functional.roundRef(c, decimals)

    def sigmoid: Column = lit(1.0) / (lit(1.0) + exp(-c.cast(DoubleType)))

    /** log is natural log, int → float (numerical_column_cpu.py:617-618).
      * C/numpy edge semantics per the reference's pinned values
      * (test_numeric_ops.py:53-79: log(0) = -inf, and std::log of a
      * negative is NaN) — Spark's builtin log returns NULL for
      * non-positive input, which would silently turn a zero into a
      * missing value. */
    def logNat: Column = {
      val d = c.cast(DoubleType)
      when(d === 0.0, lit(Double.NegativeInfinity))
        .when(d < 0.0, lit(Double.NaN))
        .otherwise(log(d))
    }
  }
}
