package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functional

/** Trained document-quality model — the CCNet/LLaMA-pipeline pattern of
  * fitting a SMALL linear scorer once and filtering the corpus with it
  * (Wenzek et al. 2020 train a fastText classifier against Wikipedia;
  * at engine level the shape is identical for any linear model: one
  * bounded fitting aggregate, a closed-form solve, one codegen'd
  * scoring scan). Here the model is a ridge regression of a target
  * column on two [[TextAnalysis.qualityFeatures]] ratios:
  *
  *   score(d) = w0 + w1·alpha_ratio(d) + w2·stopword_ratio(d)
  *
  * Fitting is EXACT where it aggregates and closed-form where it
  * solves: every Gram/moment term is unit-FLOORED per row —
  * floor(v·10⁹) as a long — before the global sum (partition-order
  * independent, like the DECIMAL mediation of q278/q284, but also
  * immune to the decimal-cast rounding-mode divergence: a dyadic
  * rational like 0.5712890625 lands exactly on the half of the 10⁻⁹
  * grid, where Spark's cast rounds HALF_UP and DuckDB's HALF_EVEN —
  * observed on this very corpus; floor of the identical IEEE product
  * is the same integer on both engines, always); the 3×3 normal-equation
  * system (XᵀX + λ·diag(0,1,1)) w = Xᵀy — intercept unpenalized, the
  * textbook ridge — is solved on the DRIVER by Cramer's rule over
  * doubles derived from those exact integers. The whole IEEE chain
  * (nine sums → three determinant ratios → per-document score) is a
  * fixed expression tree replayable bit-for-bit by an external engine.
  *
  * Scale shape (100 TB): the fit is ONE aggregate producing nine longs
  * — no iteration, no gradient passes, nothing driver-side but a 3×3
  * solve; scoring is ONE whole-stage-codegen projection over the
  * corpus (the ratio kernels are StaticInvoke'd, the affine form is
  * three fused multiply-adds). Nothing shuffles at any size.
  *
  * Reference analog: none — torcharrow computes features and leaves
  * model fitting to the trainer; a Spark-native pipeline wants the
  * filter INSIDE the engine so the corpus never leaves it. */
object QualityModel {

  /** Exact fitting sums for ridge on (1, x1, x2) → y.
    * Returns ONE row: n_docs, s1/s2/s11/s12/s22/sy/s1y/s2y ×10⁹ unit
    * longs. `x1`/`x2`/`y` are double-typed expressions over the input. */
  def gramSums(docs: DataFrame, x1: Column, x2: Column, y: Column): DataFrame = {
    def u(c: Column): Column =
      sum(floor(c * lit(1.0e9)).cast(LongType)).cast(LongType)
    docs.select(x1.as("__x1"), x2.as("__x2"), y.as("__y"))
      .agg(count(lit(1)).as("n_docs"),
        u(col("__x1")).as("s1_units"),
        u(col("__x2")).as("s2_units"),
        u(col("__x1") * col("__x1")).as("s11_units"),
        u(col("__x1") * col("__x2")).as("s12_units"),
        u(col("__x2") * col("__x2")).as("s22_units"),
        u(col("__y")).as("sy_units"),
        u(col("__x1") * col("__y")).as("s1y_units"),
        u(col("__x2") * col("__y")).as("s2y_units"))
  }

  /** The exact integer sums + solved weights of one fit. */
  final case class Fit(
      nDocs: Long,
      s1u: Long, s2u: Long, s11u: Long, s12u: Long, s22u: Long,
      syu: Long, s1yu: Long, s2yu: Long,
      lambda: Double,
      w0: Double, w1: Double, w2: Double)

  /** 3×3 determinant by first-row cofactor expansion — the ONE
    * arithmetic order both engines must share (left-to-right, no
    * refactoring: a different association is a different double). */
  private def det3(
      a: Double, b: Double, c: Double,
      d: Double, e: Double, f: Double,
      g: Double, h: Double, i: Double): Double =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** Collect the (single) sums row and solve the ridge normal equations
    * by Cramer's rule on the driver. The collect is bounded by
    * construction — one row of nine longs, the mixToTarget discipline. */
  def fit(sums: DataFrame, lambda: Double = 1.0): Fit = {
    require(lambda >= 0.0, s"QualityModel.fit: lambda=$lambda")
    val r = sums.collect() match {
      case Array(row) => row
      case rows => throw new IllegalArgumentException(
        s"QualityModel.fit: expected ONE sums row, got ${rows.length}")
    }
    def l(name: String): Long = r.getAs[Long](name)
    val n = l("n_docs")
    require(n >= 3, s"QualityModel.fit: $n docs — a 3-parameter model " +
      "needs at least 3 observations")
    val (s1u, s2u, s11u, s12u, s22u) =
      (l("s1_units"), l("s2_units"), l("s11_units"), l("s12_units"),
        l("s22_units"))
    val (syu, s1yu, s2yu) = (l("sy_units"), l("s1y_units"), l("s2y_units"))
    val nD = n.toDouble
    def f(u: Long): Double = u.toDouble / 1.0e9
    val (s1, s2, s11, s12, s22) = (f(s1u), f(s2u), f(s11u), f(s12u), f(s22u))
    val (sy, s1y, s2y) = (f(syu), f(s1yu), f(s2yu))
    val det = det3(nD, s1, s2, s1, s11 + lambda, s12, s2, s12, s22 + lambda)
    require(det != 0.0,
      "QualityModel.fit: singular normal equations (constant features " +
        "with lambda=0) — the ridge solve is undefined on this corpus")
    val w0 = det3(sy, s1, s2, s1y, s11 + lambda, s12, s2y, s12, s22 + lambda) / det
    val w1 = det3(nD, sy, s2, s1, s1y, s12, s2, s2y, s22 + lambda) / det
    val w2 = det3(nD, s1, sy, s1, s11 + lambda, s1y, s2, s12, s2y) / det
    Fit(n, s1u, s2u, s11u, s12u, s22u, syu, s1yu, s2yu, lambda, w0, w1, w2)
  }

  /** The fitted affine score as a column — three fused multiply-adds
    * inside whole-stage codegen, the "one scan filters 100 TB" path. */
  def score(fitted: Fit, x1: Column, x2: Column): Column =
    lit(fitted.w0) + lit(fitted.w1) * x1 + lit(fitted.w2) * x2

  /** Canonical feature pair of the quality filter: the two q32-oracled
    * single-scan ratio kernels (bit-identical to their DuckDB regex
    * restatements). */
  def featureX1(text: Column): Column = Functional.asciiAlphaRatio(text)
  def featureX2(text: Column): Column = Functional.stopwordRatioEn(text)
}
